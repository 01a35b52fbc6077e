"""NW-UCLA ST-ROI image feeder for the RGB ResNet branch.

Capability parity with reference feeder/feeder_nucla_resnet.py: same embedded
split lists (as data files), loads `<rgb_path>/<name>.png` ST-ROI images at
224² with ImageNet normalisation, random horizontal flip in training, and the
black-image fallback on load failure (reference :56-60). Returns
(rgb (3,224,224) f32, label, file_name).
"""
from __future__ import annotations

import os

import numpy as np

from . import transforms as T
from .splits import load_nucla_split


class NUCLAFeederResNet:
    def __init__(
        self,
        rgb_path: str,
        split: str = "train",
        temporal_rgb_frames: int = 1,
        random_flip: bool = False,
        size: int = 224,
        seed: int = 0,
        debug: bool = False,
        **_unused,
    ):
        self.rgb_path = rgb_path
        self.split = split
        self.train = split == "train"
        self.temporal_rgb_frames = temporal_rgb_frames
        self.random_flip = random_flip
        self.size = size
        self.seed = seed
        self.epoch = 0
        self.data_dict = load_nucla_split(split)
        if debug:
            self.data_dict = self.data_dict[:64]
        self.label = np.array(
            [int(info["label"]) - 1 for info in self.data_dict], np.int32
        )
        self.sample_name = [info["file_name"] for info in self.data_dict]

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.data_dict)

    def __getitem__(self, index: int):
        name = self.data_dict[index]["file_name"]
        label = int(self.label[index])
        path = os.path.join(self.rgb_path, name + ".png")
        try:
            rgb = T.load_image_chw(path, self.size)
        except Exception:
            rgb = np.zeros((3, self.size, self.size), np.float32)
        if self.train and self.random_flip:
            rng = np.random.Generator(
                np.random.Philox(key=self.seed, counter=[0, 0, self.epoch, index])
            )
            if rng.random() < 0.5:
                rgb = rgb[:, :, ::-1].copy()
        if self.temporal_rgb_frames > 1:
            rgb = np.concatenate([rgb] * self.temporal_rgb_frames, axis=0)
        return rgb, label, name

    def top_k(self, score: np.ndarray, k: int) -> float:
        return T.top_k(score, self.label, k)
