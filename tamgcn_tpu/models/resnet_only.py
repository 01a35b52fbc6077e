"""RGB-only ResNet-50 classifier over ST-ROI images.

Capability parity with reference models/resnet_only.py:5-13 — a stock
(no block-dropout) ResNet-50 with the final fc replaced by a num_class head.
`pretrained` accepts a path to a locally exported torchvision state-dict .npz
(zero-egress environment; see utils/torch_import.load_torch_resnet_npz).
"""
from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from .resnet import resnet50


class ResNetOnly(nn.Module):
    num_class: int = 10
    pretrained: Any = None  # None or path to torchvision-resnet50 .npz
    block_dropout: float = 0.0
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    def setup(self):
        self.model = resnet50(
            num_classes=self.num_class, block_dropout=self.block_dropout,
            dtype=self.dtype,
        )

    def __call__(self, x, *, train: bool = False):
        return self.model(x, train=train)

    def load_pretrained(self, variables):
        """Merge torchvision trunk weights (fc excluded) into `variables`."""
        if not self.pretrained:
            return variables
        from ..utils.torch_import import load_torch_resnet_npz

        return load_torch_resnet_npz(
            self.pretrained, variables, submodule="model", skip_fc=True
        )
