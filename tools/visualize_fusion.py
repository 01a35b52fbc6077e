#!/usr/bin/env python
"""Fusion-effect visualiser: CTR-GCN activation intensity gating an ST-ROI image.

Capability parity with reference visual.py:14-117: runs CTR-GCN
extract_feature, L2-norms channels into a per-(T, V) intensity map, builds a
per-joint column weight map for selected target joints, bilinearly resizes it
onto the RGB ST-ROI image, and renders a 3-panel matplotlib figure
(original / weight map / gated).

    python tools/visualize_fusion.py --weights <ckpt_dir_or_npz> \
        --data_path data/nucla/all_sqe --rgb_root data/nucla/st_roi \
        --sample a01_s01_e00_v03 --out fusion_vis.png
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_JOINTS = {  # joints highlighted in the reference figure (visual.py:62-83)
    "head": 3, "l_hand": 7, "r_hand": 11, "l_foot": 15, "r_foot": 19,
}


def joint_intensity(model, variables, skeleton: np.ndarray) -> np.ndarray:
    """(T', V) channel-L2 intensity of the pre-pool feature (visual.py:53-57)."""
    import jax.numpy as jnp

    feat, _ = model.apply(
        variables, jnp.asarray(skeleton[None]), train=False,
        method="extract_feature",
    )  # (1, C, T', V, M)
    inten = np.linalg.norm(np.asarray(feat)[0], axis=0)[..., 0]  # (T', V)
    return inten / (inten.max() + 1e-9)


def column_weight_map(
    inten: np.ndarray, image_hw: tuple[int, int],
    target_joints=tuple(TARGET_JOINTS.values()),
) -> np.ndarray:
    """Per-joint mean intensity -> per-column weights resized to the image
    (visual.py:62-90). ST-ROI images lay joints out left-to-right."""
    from PIL import Image

    per_joint = inten.mean(axis=0)  # (V,)
    weights = np.full_like(per_joint, per_joint.mean())
    for j in target_joints:
        weights[j] = per_joint[j]
    col = np.tile(weights[None, :], (8, 1)).astype(np.float32)
    img = Image.fromarray((col * 255).astype(np.uint8))
    img = img.resize((image_hw[1], image_hw[0]), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def main(argv=None):
    p = argparse.ArgumentParser(description="fusion effect visualiser")
    p.add_argument("--weights", required=True)
    p.add_argument("--data_path", default="data/nucla/all_sqe")
    p.add_argument("--rgb_root", default="data/nucla/st_roi")
    p.add_argument("--sample", default=None, help="file_name; default first val")
    p.add_argument("--out", default="fusion_vis.png")
    arg = p.parse_args(argv)

    import jax

    from tamgcn_tpu.data import NUCLAFeederGCN
    from tamgcn_tpu.data.transforms import load_image_chw
    from tamgcn_tpu.models import create_ctrgcn_nucla
    from tamgcn_tpu.train.checkpoint import Checkpointer

    feeder = NUCLAFeederGCN(arg.data_path, split="val")
    idx = 0
    if arg.sample:
        idx = feeder.sample_name.index(arg.sample)
    skeleton, label, _ = feeder[idx]
    name = feeder.sample_name[idx]

    model = create_ctrgcn_nucla()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 3, 52, 20, 1), np.float32),
        train=False,
    )
    if arg.weights.endswith(".npz"):
        from tamgcn_tpu.utils.torch_import import import_ctrgcn_state_dict

        variables = import_ctrgcn_state_dict(dict(np.load(arg.weights)))
    else:
        ckptr = Checkpointer(arg.weights)
        variables = ckptr.restore(
            "best" if ckptr.exists("best") else f"epoch{ckptr.latest_epoch()}",
            target=jax.device_get(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
            ),
        )

    inten = joint_intensity(model, variables, skeleton)
    rgb_path = os.path.join(arg.rgb_root, name + ".png")
    if os.path.exists(rgb_path):
        rgb = np.transpose(load_image_chw(rgb_path, 224, normalize=False), (1, 2, 0))
    else:
        rgb = np.zeros((224, 224, 3), np.float32)
    wmap = column_weight_map(inten, rgb.shape[:2])
    gated = rgb * wmap[..., None]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, img, title in zip(
        axes, [rgb, wmap, gated],
        [f"ST-ROI: {name} (label {label})", "GCN weight map", "gated"],
    ):
        ax.imshow(np.clip(img, 0, 1), cmap="viridis" if img.ndim == 2 else None)
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(arg.out, dpi=120)
    print(f"saved {arg.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
