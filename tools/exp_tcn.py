#!/usr/bin/env python
"""Round-4 MultiScaleTCN cost decomposition + reformulation candidates.

The TCN costs ~7.5 ms fwd+bwd in the f32 train step (exp_step_ablation).
This probe times, per backbone block shape, fwd and fwd+bwd of:

  full       the production MultiScaleTCN (flax convs)
  prefix     packed 1x1 conv + BN + relu only
  dilated    the two dilated (k=5, d=1/2) branch convs only
  maxpool    the maxpool branch only
  pw         the plain 1x1 branch only
  outbn      concat + out BN only
  shiftmm    dilated convs reformulated as 5 shifted matmul-adds

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_tcn.py
"""
from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tamgcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from flax import linen as nn  # noqa: E402

from tamgcn_tpu.models.ctrgcn import MultiScaleTCN  # noqa: E402
from tamgcn_tpu.utils.timing import time_chained  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 64


def time_mod(mod, x, train=True, needs_rng=False):
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)

    def fwd(v, xx):
        out, _ = mod.apply(v, xx, train=train, mutable=["batch_stats"])
        return out

    def feed(out, a):
        return (a[0], a[1] + 1e-9 * out.mean())

    dt_f = time_chained(fwd, feed, (variables, x), chain=40, iters=10)

    def loss(v, xx):
        out, _ = mod.apply(v, xx, train=train, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.grad(loss, argnums=1)

    def feed_g(out, a):
        return (a[0], out)

    dt_g = time_chained(g, feed_g, (variables, x), chain=40, iters=10)
    return dt_f, dt_g


class PrefixOnly(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train):
        from tamgcn_tpu.models.ctrgcn import BN, _bn_weights_init
        from tamgcn_tpu.ops.norm import BatchNorm
        bc = self.out_channels // 6
        h = nn.Conv(3 * bc, (1, 1), name="prefix_conv")(x)
        h = BatchNorm(use_running_average=not train,
                      scale_init=_bn_weights_init, **BN, name="prefix_bn")(h)
        return nn.relu(h)


class DilatedOnly(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train):
        bc = self.out_channels // 6
        outs = []
        for i, dil in enumerate((1, 2)):
            pad = (5 + (5 - 1) * (dil - 1) - 1) // 2
            b = nn.Conv(bc, (5, 1), strides=(self.stride, 1),
                        kernel_dilation=(dil, 1),
                        padding=[(pad, pad), (0, 0)],
                        name=f"b{i}")(x[..., i * bc:(i + 1) * bc])
            outs.append(b)
        return jnp.concatenate(outs, -1)


class ShiftMM(nn.Module):
    """Dilated k=5 convs as 5 shifted (T-rolled) 1x1 matmul-adds."""
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train):
        bc = self.out_channels // 6
        outs = []
        for i, dil in enumerate((1, 2)):
            xin = x[..., i * bc:(i + 1) * bc]
            T = xin.shape[1]
            acc = None
            for k in range(5):
                w = self.param(f"w{i}_{k}", nn.initializers.normal(0.05),
                               (bc, bc))
                off = (k - 2) * dil
                xs = jnp.roll(xin, -off, axis=1)
                # zero the wrapped frames
                t = jnp.arange(T)
                mask = ((t + off >= 0) & (t + off < T)).astype(xin.dtype)
                term = jnp.einsum("ntvc,cd->ntvd", xs * mask[None, :, None, None], w)
                acc = term if acc is None else acc + term
            if self.stride > 1:
                acc = acc[:, ::self.stride]
            outs.append(acc)
        return jnp.concatenate(outs, -1)


class MaxPoolOnly(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train):
        bc = self.out_channels // 6
        return nn.max_pool(x[..., :bc], window_shape=(3, 1),
                           strides=(self.stride, 1),
                           padding=[(1, 1), (0, 0)])


class PwOnly(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train):
        bc = self.out_channels // 6
        return nn.Conv(bc, (1, 1), strides=(self.stride, 1), name="pw")(x)


class OutBNOnly(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train):
        from tamgcn_tpu.models.ctrgcn import BN, _bn_weights_init
        from tamgcn_tpu.ops.norm import BatchNorm
        return BatchNorm(use_running_average=not train,
                         scale_init=_bn_weights_init, **BN, name="out_bn")(x)


SHAPES = [
    # (T, C, stride, nlayers)  — TCN input = UnitGCN output
    (52, 64, 1, 4),
    (52, 128, 2, 1),
    (26, 128, 1, 2),
    (26, 256, 2, 1),
    (13, 256, 1, 2),
]


def main():
    log("backend:", jax.default_backend(), jax.devices())
    rs = np.random.RandomState(0)
    for (T, C, stride, nl) in SHAPES:
        x = jnp.asarray(rs.randn(N, T, 20, C), jnp.float32)
        log(f"--- T={T} C={C} stride={stride} x{nl} ---")
        for name, modcls in (
            ("full", lambda: MultiScaleTCN(C, C, kernel_size=5, stride=stride,
                                           dilations=(1, 2), residual=False)),
            ("prefix", lambda: PrefixOnly(C, stride)),
            ("dilated", lambda: DilatedOnly(C, stride)),
            ("shiftmm", lambda: ShiftMM(C, stride)),
            ("maxpool", lambda: MaxPoolOnly(C, stride)),
            ("pw", lambda: PwOnly(C, stride)),
            ("outbn", lambda: OutBNOnly(C, stride)),
        ):
            try:
                dt_f, dt_g = time_mod(modcls(), x)
                log(f"  {name:8s} fwd {dt_f*1e6:8.1f} us   fwd+bwd {dt_g*1e6:8.1f} us")
            except Exception as e:
                log(f"  {name:8s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
