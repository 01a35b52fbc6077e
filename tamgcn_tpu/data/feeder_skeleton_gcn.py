"""Generic JSON-skeleton feeder: any joint count / person count (NTU-60 …).

The reference framework only ships an NW-UCLA feeder (feeder/
feeder_nucla_gcn.py) but carries graph definitions for NTU RGB+D
(graph/ntu_rgb_d.py) with no data path to use them; this feeder closes that
gap with the same per-sample pipeline generalised over (V, M):

  * dataset layout: `<data_path>/<split>_split.json` — a list of
    `{"file_name": ..., "label": <1-based int>}` records — and per-sample
    skeletons at `<data_path>/<name>/<name>.json` or `<data_path>/<name>.json`
    holding `{"skeletons": (T, V, 3) | (T, M, V, 3)}` (the NUCLA layout,
    reference feeder_nucla_gcn.py:54-64, extended with a person axis);
  * pipeline (reference :85-154): center on `center_joint` of frame 0
    (person 0), random 3-D view rotation + scale (train), per-sample min-max
    normalisation to [-1, 1], temporal resample (train: sorted
    random-with-replacement; eval: linspace), bone/motion modalities with
    the bone table chosen by joint count (NUCLA-20 / NTU-25);
  * output: (3, time_steps, V, num_person) float32 — persons padded with
    zeros or truncated by total motion energy.

Single-person datasets get the native (C++/OpenMP) batched fast path for
free via `get_batch`, same as the NUCLA feeder.
"""
from __future__ import annotations

import json
import os

import numpy as np

from . import transforms as T


class SkeletonFeederGCN:
    """Map-style dataset yielding (skeleton (3, T, V, M) f32, label, index)."""

    def __init__(
        self,
        data_path: str,
        split: str = "train",
        modality: str = "joint",  # joint | bone | motion
        repeat: int = 1,
        time_steps: int = 64,
        num_person: int = 1,
        center_joint: int = 1,
        random_rotation_deg: int = 60,
        scale_range: tuple[float, float] = (0.5, 1.5),
        seed: int = 0,
        debug: bool = False,
        backend: str = "auto",  # auto | native | numpy
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
        self.num_person = num_person
        self.center_joint = center_joint
        self.random_rotation_deg = random_rotation_deg
        self.scale_range = scale_range
        self.seed = seed
        self.epoch = 0

        with open(os.path.join(data_path, f"{split}_split.json")) as f:
            self.data_dict = json.load(f)
        if debug:
            self.data_dict = self.data_dict[:64]
        self.label = np.array(
            [int(info["label"]) - 1 for info in self.data_dict], np.int32
        )
        self.sample_name = [info["file_name"] for info in self.data_dict]
        self._load_data()
        self.num_joint = self.data[0].shape[-2] if self.data else 0

        # native fast path: single-person clips only (the batched C++ core
        # is (T, V, 3) shaped); bone tables exist for V=20/25
        self._native = False
        has_bones = modality != "bone" or self.num_joint in (20, 25)
        if backend in ("auto", "native") and num_person == 1 and has_bones:
            single = all(d.ndim == 3 for d in self.data)
            if single and center_joint == self._native_center_joint():
                from .. import runtime

                self._native = runtime.available()
        if backend == "native" and not self._native:
            raise RuntimeError(
                "native augmentation backend unavailable for this dataset"
            )

    @staticmethod
    def _native_center_joint() -> int:
        return 1  # the C++ core centers on joint index 1, like the reference

    def _load_data(self):
        self.data = []
        for info in self.data_dict:
            name = info["file_name"]
            path = os.path.join(self.data_path, name, name + ".json")
            if not os.path.exists(path):
                path = os.path.join(self.data_path, name + ".json")
            with open(path) as f:
                skeletons = json.load(f)["skeletons"]
            self.data.append(np.asarray(skeletons, np.float64))

    def set_epoch(self, epoch: int):
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
        if value.ndim == 3:  # (T, V, 3) -> (T, 1, V, 3)
            value = value[:, None, :, :]
        t_in, m_in, V, _ = value.shape

        if self.train:
            r = self.random_rotation_deg
            agx = int(rng.integers(-r, r + 1))
            agy = int(rng.integers(-r, r + 1))
            s = float(rng.uniform(*self.scale_range))
        else:
            agx, agy, s = 0, 0, 1.0

        # center all persons on person 0's center joint at frame 0
        value = value - value[0:1, 0:1, self.center_joint:self.center_joint + 1, :]
        value = T.rand_view_transform(value, agx, agy, s)
        value = T.minmax_normalize(value)

        if self.train:
            idx = T.resample_train(t_in, self.time_steps, rng)
        else:
            idx = T.resample_eval(t_in, self.time_steps)
        data = value[idx]  # (T, M, V, 3)

        if self.modality == "bone":
            bones = T.bones_for(V)
            data = np.stack(
                [T.to_bone(data[:, m], bones) for m in range(m_in)], axis=1
            )
        elif self.modality == "motion":
            data = T.to_motion(data)

        # (T, M, V, 3) -> (3, T, V, M), pad/truncate persons
        data = np.transpose(data, (3, 0, 2, 1))
        M = self.num_person
        if m_in < M:
            pad = np.zeros((3, self.time_steps, V, M - m_in), data.dtype)
            data = np.concatenate([data, pad], axis=-1)
        elif m_in > M:
            # keep the persons with the most motion energy
            energy = np.abs(np.diff(data, axis=1)).sum(axis=(0, 1, 2))
            keep = np.sort(np.argsort(-energy)[:M])
            data = data[..., keep]
        return data.astype(np.float32), label, index

    def get_batch(self, indices):
        """Batched native augmentation fast path (single-person datasets)."""
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
        return data, self.label[base], base.astype(np.int64)

    def top_k(self, score: np.ndarray, k: int) -> float:
        return T.top_k(score, self.label, k)
