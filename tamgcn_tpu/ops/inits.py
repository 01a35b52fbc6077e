"""Parameter initialisers matching the reference's PyTorch init schemes.

Flax conv kernels are (kh, kw, in, out); PyTorch conv weights are
(out, in, kh, kw). The fan computations below account for that layout.
Semantics mirror reference models/ctrgcn.py:17-49 (conv_branch_init,
conv_init, bn_init, weights_init) and models/ctrgcn.py:317 (fc init).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """PyTorch nn.init.kaiming_normal_(mode='fan_out') for a flax conv kernel.

    fan_out = out_channels * prod(kernel_dims); gain = sqrt(2) (leaky_relu a=0).
    Reference models/ctrgcn.py:26-30 (conv_init).
    """
    *kernel_dims, _, out_ch = shape
    receptive = 1
    for k in kernel_dims:
        receptive *= k
    std = math.sqrt(2.0 / (out_ch * receptive))
    return std * jax.random.normal(key, shape, dtype)


def kaiming_normal_fan_out_blocked(blocks: int):
    """kaiming_normal_(mode='fan_out') for a PACKED conv kernel holding
    `blocks` independent convs concatenated on the output axis.

    The reference initialises each subset conv separately with
    fan_out = (out_ch / blocks) * receptive (models/ctrgcn.py:26-30); packing
    the three subset convs into one kernel must not change the per-slice
    distribution, so the fan_out uses the per-block width.
    """

    def init(key, shape, dtype=jnp.float32):
        *kernel_dims, _, out_ch = shape
        receptive = 1
        for k in kernel_dims:
            receptive *= k
        std = math.sqrt(2.0 / ((out_ch // blocks) * receptive))
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal_fan_out_dense(key, shape, dtype=jnp.float32):
    """kaiming_normal_(mode='fan_out') for an (..., in, out) kernel: fan_out
    is the trailing output width; leading dims are independent blocks (e.g.
    the stacked per-subset conv4 kernels (S, R, C))."""
    std = math.sqrt(2.0 / shape[-1])
    return std * jax.random.normal(key, shape, dtype)


def conv_branch_init(branches: int):
    """Normal(0, sqrt(2 / (out * in * kh * branches))) for a flax conv kernel.

    Reference models/ctrgcn.py:17-23: n=out_ch, k1=in_ch, k2=first kernel dim.
    """

    def init(key, shape, dtype=jnp.float32):
        *kernel_dims, in_ch, out_ch = shape
        k2 = kernel_dims[0] if kernel_dims else 1
        std = math.sqrt(2.0 / (out_ch * in_ch * k2 * branches))
        return std * jax.random.normal(key, shape, dtype)

    return init


def constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def fc_init(num_class: int):
    """Normal(0, sqrt(2/num_class)) head init (reference models/ctrgcn.py:317)."""

    def init(key, shape, dtype=jnp.float32):
        return math.sqrt(2.0 / num_class) * jax.random.normal(key, shape, dtype)

    return init


def bn_scale_init(scale: float):
    """BatchNorm weight=scale, bias=0 (reference models/ctrgcn.py:33-35)."""
    return constant(scale)
