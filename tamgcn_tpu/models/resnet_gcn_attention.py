"""Cross-modal attention fusion: frozen CTR-GCN features gate ResNet-50 channels.

Capability parity with reference models/resnet_gcn_attention.py:6-122:

  * CTR-GCN submodule built with the same args, frozen when freeze_gcn
    (reference :24-26) — freezing is enforced functionally: the trainer
    applies stop_gradient over the 'gcn' param subtree and excludes it from
    weight decay (reference semantics of requires_grad=False);
  * ResNet-50 trunk with conv1 inflated 3 -> in_channels_rgb by replicating
    pretrained kernels / (in_channels_rgb // 3) (reference :37-52; the
    inflation happens at weight-import time, utils/torch_import);
  * attention MLP 256 -> 1024 -> BN -> ReLU -> 2048 -> sigmoid (reference
    :60-66) gating the layer4 map (:112), then global pool + linear head.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm import BatchNorm

from .ctrgcn import CTRGCN
from .resnet import BN, resnet50


class ResNetGCNAttention(nn.Module):
    num_class: int = 10
    num_point: int = 20
    num_person: int = 1
    graph: Any = None
    graph_args: Any = None
    in_channels_gcn: int = 3
    in_channels_rgb: int = 15
    drop_out: float = 0.0
    adaptive: bool = True
    freeze_gcn: bool = True
    # True (default): the frozen GCN runs in eval mode (running-stat BN) —
    # the principled frozen-extractor semantics. False reproduces the
    # reference literally, where model.train() also puts the frozen GCN's
    # BatchNorms in batch-stat mode and updates their running buffers.
    freeze_gcn_bn: bool = True
    use_pallas: bool | None = None
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    def setup(self):
        if self.graph is None:
            raise ValueError("graph must be specified")
        self.gcn = CTRGCN(
            num_class=self.num_class,
            num_point=self.num_point,
            num_person=self.num_person,
            graph=self.graph,
            graph_args=self.graph_args,
            in_channels=self.in_channels_gcn,
            drop_out=self.drop_out,
            adaptive=self.adaptive,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
        )
        self.resnet = resnet50(
            in_channels=self.in_channels_rgb, dtype=self.dtype
        )
        gcn_dim, rgb_dim = 256, 2048
        self.att_dense1 = nn.Dense(rgb_dim // 2, dtype=self.dtype,
                                   name="attention_transform_dense1")
        self.att_bn = BatchNorm(**BN, dtype=self.dtype,
                                name="attention_transform_bn")
        self.att_dense2 = nn.Dense(rgb_dim, dtype=self.dtype,
                                   name="attention_transform_dense2")
        self.classifier = nn.Dense(self.num_class, name="classifier")

    def __call__(self, x_gcn, x_rgb, *, train: bool = False):
        """x_gcn: (N, C, T, V, M) skeletons; x_rgb: (N, 3F, H, W) or NHWC."""
        # 1. frozen GCN semantic guidance (reference :82-91)
        gcn_train = train and not (self.freeze_gcn and self.freeze_gcn_bn)
        f_gcn, _ = self.gcn.extract_feature(x_gcn, train=gcn_train)
        if self.freeze_gcn:
            f_gcn = jax.lax.stop_gradient(f_gcn)
        f_gcn = f_gcn.mean(axis=(2, 3, 4))  # (N, 256)
        att = self.att_dense1(f_gcn)
        att = self.att_bn(att, use_running_average=not train)
        att = nn.relu(att)
        att = nn.sigmoid(self.att_dense2(att))  # (N, 2048)

        # 2. ResNet trunk to layer4 (reference :97-105); NHWC feature map
        f_rgb = self.resnet.features(x_rgb, train=train)  # (N, 7, 7, 2048)

        # 3. channel gate + global pool + classify (reference :112-120)
        f_att = f_rgb * att[:, None, None, :]
        out = f_att.mean(axis=(1, 2))
        # logits in f32 (promote, not cast — f64 equivalence stays f64)
        out = self.classifier(out)
        return out.astype(jnp.promote_types(out.dtype, jnp.float32))

    def extract_feature(self, x_gcn, *, train: bool = False):
        return self.gcn.extract_feature(x_gcn, train=train)
