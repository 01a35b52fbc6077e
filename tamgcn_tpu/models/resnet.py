"""ResNet family (NHWC, flax) with the reference's block-dropout variant.

Capability parity with reference models/resnet.py — a torchvision-lineage
ResNet whose only behavioural modification is a p=0.1 Dropout applied after
each block activation (reference :57,:65,:76,:102,:110,:116,:127, the
"#Bruce" edits) — plus the stock (no-dropout) configuration used by
models/resnet_only.py. Constructors resnet18..resnet152 and wide variants
(reference :227-347).

Pretrained ImageNet weights: this environment has no network egress, so
`pretrained=True` is replaced by `load_torch_resnet_npz` — an import shim for
a locally exported torchvision state dict (utils/torch_import layout rules).

TPU notes: NHWC end to end; the stem 7x7 stride-2 conv and 3x3 convs lower
straight onto the MXU; inference BN folds into convs under XLA.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm import BatchNorm

from ..ops.inits import kaiming_normal_fan_out

BN = {"momentum": 0.9, "epsilon": 1e-5}


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    in_f, _ = shape
    bound = 1.0 / math.sqrt(in_f)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv(features, kernel, stride=1, dilation=1, dtype=None, name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        kernel_init=kaiming_normal_fan_out,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (reference models/resnet.py:35-78)."""

    expansion = 1
    planes: int
    stride: int = 1
    downsample: bool = False
    block_dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        def bn(name):
            return BatchNorm(
                use_running_average=not train, dtype=self.dtype, **BN, name=name
            )

        def drop(h):
            if self.block_dropout:
                h = nn.Dropout(self.block_dropout, deterministic=not train)(h)
            return h

        identity = x
        out = _conv(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = drop(out)
        out = _conv(self.planes, 3, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            identity = _conv(
                self.planes, 1, self.stride, dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)
        out = nn.relu(out + identity)
        return drop(out)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck block (reference models/resnet.py:81-129)."""

    expansion = 4
    planes: int
    stride: int = 1
    downsample: bool = False
    base_width: int = 64
    dilation: int = 1
    block_dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        def bn(name):
            return BatchNorm(
                use_running_average=not train, dtype=self.dtype, **BN, name=name
            )

        def drop(h):
            if self.block_dropout:
                h = nn.Dropout(self.block_dropout, deterministic=not train)(h)
            return h

        width = int(self.planes * (self.base_width / 64.0))
        identity = x
        out = _conv(width, 1, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = drop(out)
        out = _conv(
            width, 3, self.stride, self.dilation, dtype=self.dtype, name="conv2"
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = drop(out)
        out = _conv(
            self.planes * self.expansion, 1, dtype=self.dtype, name="conv3"
        )(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = _conv(
                self.planes * self.expansion, 1, self.stride, dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity)
        out = nn.relu(out + identity)
        return drop(out)


class ResNet(nn.Module):
    """Reference models/resnet.py:132-224 trunk; input NCHW or NHWC images.

    `features(x)` returns the layer4 map (N, H/32, W/32, 512*expansion) —
    the hook the cross-modal attention model gates (resnet_gcn_attention).
    """

    block: Any = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    in_channels: int = 3
    width_per_group: int = 64
    block_dropout: float = 0.0
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    def setup(self):
        self.stem_conv = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            kernel_init=kaiming_normal_fan_out,
            dtype=self.dtype,
            name="conv1",
        )
        self.stem_bn = BatchNorm(dtype=self.dtype, **BN, name="bn1")
        blocks = []
        inplanes = 64
        for li, (planes, n, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))
        ):
            layer = []
            for bi in range(n):
                s = stride if bi == 0 else 1
                need_down = bi == 0 and (
                    s != 1 or inplanes != planes * self.block.expansion
                )
                kwargs = dict(
                    planes=planes,
                    stride=s,
                    downsample=need_down,
                    block_dropout=self.block_dropout,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )
                if self.block is Bottleneck:
                    kwargs["base_width"] = self.width_per_group
                layer.append(self.block(**kwargs))
                inplanes = planes * self.block.expansion
            blocks.append(layer)
        self.layer1, self.layer2, self.layer3, self.layer4 = blocks
        feat = 512 * self.block.expansion
        self.fc = nn.Dense(
            self.num_classes,
            kernel_init=_torch_linear_kernel_init,
            bias_init=_torch_linear_bias_init(feat),
            dtype=self.dtype,
        )

    def _to_nhwc(self, x):
        # accept NCHW (reference convention) or NHWC
        if x.shape[1] == self.in_channels and x.shape[-1] != self.in_channels:
            x = jnp.transpose(x, (0, 2, 3, 1))
        return x

    def stem(self, x, train: bool):
        x = self._to_nhwc(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = self.stem_conv(x)
        x = self.stem_bn(x, use_running_average=not train)
        x = nn.relu(x)
        return nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

    def features(self, x, *, train: bool = False):
        """Stem + layer1..layer4 -> (N, H/32, W/32, C_feat)."""
        h = self.stem(x, train)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            for blk in layer:
                h = blk(h, train=train)
        return h

    def __call__(self, x, *, train: bool = False):
        h = self.features(x, train=train)
        h = h.mean(axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + flatten
        # logits in f32: the loss/softmax should not run in bf16
        # promote (not cast): bf16 -> f32 for the loss, f64 stays f64
        h = self.fc(h)
        return h.astype(jnp.promote_types(h.dtype, jnp.float32))


def resnet18(**kw):
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw):
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), **kw)


def resnet152(**kw):
    return ResNet(block=Bottleneck, layers=(3, 8, 36, 3), **kw)


def wide_resnet50_2(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), width_per_group=128, **kw)


def wide_resnet101_2(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), width_per_group=128, **kw)
