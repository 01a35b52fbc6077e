"""NW-UCLA skeleton feeder for the GCN model families.

Capability parity with reference feeder/feeder_nucla_gcn.py:
  * embedded train/val split lists -> data files (tamgcn_tpu/data/splits/);
  * JSON skeleton loading `<data_path>/<name>/<name>.json` -> 'skeletons'
    (reference :54-64);
  * per-sample pipeline (reference :85-154): center on joint 1 frame 0,
    random 3-D view rotation ±60° + scale U(0.5, 1.5) (train), per-sample
    min-max normalisation to [-1, 1], temporal resample to T=52 (train:
    sorted random-with-replacement; val: linspace);
  * bone / motion modality derivation keyed on the `modality` arg (the
    reference keys it on substrings of label_path, :119-127);
  * `repeat` oversampling (:72-73,86) and `top_k` scoring (:156-159);
  * optional last-RGB-frame loading at 299² with ImageNet normalisation
    (:131-153) including the black-image fallback.

Differences (deliberate): randomness is an explicit per-index
np.random.Generator seeded from (seed, epoch, index) so augmentation is
reproducible and shardable across hosts — the reference relies on global
`random` state in DataLoader workers.
"""
from __future__ import annotations

import json
import os
import re

import numpy as np

from . import transforms as T
from .splits import load_nucla_split


class NUCLAFeederGCN:
    """Map-style dataset yielding (skeleton (3, 52, 20, 1) f32, label, index)."""

    def __init__(
        self,
        data_path: str,
        split: str = "train",
        modality: str = "joint",  # joint | bone | motion
        repeat: int = 1,
        time_steps: int = 52,
        random_rotation_deg: int = 60,
        scale_range: tuple[float, float] = (0.5, 1.5),
        seed: int = 0,
        load_rgb: bool = False,
        rgb_size: int = 299,
        debug: bool = False,
        dtype: str = "float32",  # skeleton output dtype; float64 for the
        # f64 full-pipeline equivalence harness (tests/test_train_pipeline.py)
        backend: str = "auto",  # auto | native | numpy
        # reference-config compatibility; accepted and unused, like the
        # reference Feeder's random_choose/random_shift/... args for NUCLA
        **_unused,
    ):
        if modality not in ("joint", "bone", "motion"):
            raise ValueError(f"unknown modality {modality!r}")
        self.data_path = data_path
        self.split = split
        self.train = split == "train"
        self.modality = modality
        self.repeat = repeat if self.train else 1
        self.time_steps = time_steps
        self.random_rotation_deg = random_rotation_deg
        self.scale_range = scale_range
        self.seed = seed
        self.epoch = 0
        self.load_rgb = load_rgb
        self.dtype = np.dtype(dtype)
        self.rgb_size = rgb_size

        self.data_dict = load_nucla_split(split)
        if debug:
            self.data_dict = self.data_dict[:64]
        self.label = np.array(
            [int(info["label"]) - 1 for info in self.data_dict], np.int32
        )
        self.sample_name = [info["file_name"] for info in self.data_dict]
        self._load_data()

        self._native = False
        if (backend in ("auto", "native") and not load_rgb
                and self.dtype == np.float32):  # native core emits f32 only
            from .. import runtime

            self._native = runtime.available()
            if backend == "native" and not self._native:
                raise RuntimeError("native augmentation backend unavailable")

    def _load_data(self):
        self.data = []
        for info in self.data_dict:
            name = info["file_name"]
            path = os.path.join(self.data_path, name, name + ".json")
            with open(path) as f:
                skeletons = json.load(f)["skeletons"]
            self.data.append(np.asarray(skeletons, np.float64))  # (T, 20, 3)

    def set_epoch(self, epoch: int):
        """Advance the augmentation RNG stream (multi-host seed discipline)."""
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.data_dict) * self.repeat

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.Generator(
            np.random.Philox(key=self.seed, counter=[0, 0, self.epoch, index])
        )

    def __getitem__(self, index: int):
        rng = self._rng(index)
        index = index % len(self.data_dict)
        label = int(self.label[index])
        value = self.data[index]

        if self.train:
            r = self.random_rotation_deg
            agx = int(rng.integers(-r, r + 1))
            agy = int(rng.integers(-r, r + 1))
            s = float(rng.uniform(*self.scale_range))
        else:
            agx, agy, s = 0, 0, 1.0

        # center on joint 1 of frame 0 (reference :99-100)
        value = value - value[0:1, 1:2, :]
        value = T.rand_view_transform(value, agx, agy, s)
        value = T.minmax_normalize(value)

        length = value.shape[0]
        if self.train:
            idx = T.resample_train(length, self.time_steps, rng)
        else:
            idx = T.resample_eval(length, self.time_steps)
        data = value[idx]  # (T=52, 20, 3)

        if self.modality == "bone":
            data = T.to_bone(data)
        elif self.modality == "motion":
            data = T.to_motion(data)

        data = np.transpose(data, (2, 0, 1)).reshape(3, self.time_steps, 20, 1)
        # round through f32 first in every dtype mode: the reference feeder
        # emits f32 (reference :154), so a float64 consumer (the f64
        # equivalence harness) must see the same f32-rounded values widened,
        # not the unrounded f64 pipeline values
        out = data.astype(np.float32).astype(self.dtype)
        if self.load_rgb:
            rgb = self._load_last_rgb_frame(index)
            return out, rgb, label, index
        return out, label, index

    def _load_last_rgb_frame(self, index: int) -> np.ndarray:
        """Last '*rgb.jpg' frame at rgb_size² (reference :131-153)."""
        name = self.data_dict[index]["file_name"]
        sample_dir = os.path.join(self.data_path, name)
        rgb = np.zeros((3, self.rgb_size, self.rgb_size), np.float32)
        if os.path.isdir(sample_dir):
            imgs = [f for f in os.listdir(sample_dir) if f.lower().endswith("rgb.jpg")]
            if imgs:

                def frame_num(fname):
                    m = re.search(r"frame_(\d+)_", fname)
                    return int(m.group(1)) if m else 99999999

                imgs.sort(key=frame_num)
                try:
                    rgb = T.load_image_chw(
                        os.path.join(sample_dir, imgs[-1]), self.rgb_size
                    )
                except Exception:
                    pass
        return rgb

    def get_batch(self, indices):
        """Batched native augmentation fast path (C++/OpenMP core,
        tamgcn_tpu.runtime). ~13x the numpy per-sample path; BOTH the eval
        and train pipelines are bit-identical with the numpy path — the
        native core implements the same numpy Philox (seed, epoch, index)
        streams draw-for-draw (tests/test_runtime_native.py)."""
        if not self._native:
            return None
        from .. import runtime

        indices = np.asarray(indices, np.int64)
        base = indices % len(self.data_dict)
        data = runtime.augment_batch(
            [self.data[i] for i in base],
            indices,
            time_steps=self.time_steps,
            train=self.train,
            modality=self.modality,
            seed=self.seed,
            epoch=self.epoch,
        )
        labels = self.label[base]
        return data, labels, base.astype(np.int64)

    def top_k(self, score: np.ndarray, k: int) -> float:
        return T.top_k(score, self.label, k)
