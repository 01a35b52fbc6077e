#!/usr/bin/env python
"""Fused multi-scale TCN kernel attempt (round 4, SURVEY's third named
kernel): the two dilated (k=5, d=1/2) branch convs + the maxpool branch of
MultiScaleTCN, eval-mode (affines folded), in one Pallas kernel that keeps
the whole (T, V, 3*bc) activation in VMEM — every backbone shape fits whole
so there is no halo bookkeeping, taps are leading-dim t-shifts feeding thin
MXU dots.

Compares against the XLA lowering the engine uses today
(lax.conv_general_dilated per branch + reduce_window + concat).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_ms_tcn.py
"""
from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tamgcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tamgcn_tpu.utils.timing import time_chained  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DILS = (1, 2)
KS = 5


def _kernel(p_ref, w_ref, b_ref, mp_ref, out_ref, *, bc: int, stride: int,
            T: int):
    """p (BN, T, V, 3*bc); w (2, KS, bc, bc); b (2, bc); mp (2, bc);
    out (BN, T//stride, V, 3*bc)."""
    BN, _, V, _ = p_ref.shape
    outs = []
    for i, d in enumerate(DILS):
        seg = p_ref[:, :, :, i * bc:(i + 1) * bc].astype(jnp.float32)
        pad = (KS - 1) * d // 2
        # zero-pad T in VMEM (leading-dim concat, cheap addressing)
        zp = jnp.zeros((BN, pad, V, bc), jnp.float32)
        segp = jnp.concatenate([zp, seg, zp], axis=1)  # (BN, T+2pad, V, bc)
        acc = None
        for k in range(KS):
            win = segp[:, k * d:k * d + T]             # (BN, T, V, bc)
            term = jnp.dot(
                win.reshape(BN * T * V, bc), w_ref[i, k],
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
        y = acc.reshape(BN, T, V, bc) + b_ref[i][None, None, None, :]
        if stride > 1:  # strided slice lowers to gather; use reshape+slice
            y = y.reshape(BN, T // stride, stride, V, bc)[:, :, 0]
        outs.append(y)
    # maxpool branch: window 3, same pad
    seg = p_ref[:, :, :, 2 * bc:3 * bc].astype(jnp.float32)
    neg = jnp.full((BN, 1, V, bc), -jnp.inf, jnp.float32)
    segp = jnp.concatenate([neg, seg, neg], axis=1)
    mp = jnp.maximum(jnp.maximum(segp[:, 0:T], segp[:, 1:T + 1]),
                     segp[:, 2:T + 2])
    mp = mp * mp_ref[0][None, None, None, :] + mp_ref[1][None, None, None, :]
    if stride > 1:
        mp = mp.reshape(BN, T // stride, stride, V, bc)[:, :, 0]
    outs.append(mp)
    out_ref[:] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


def ms_tcn_fused(prefix, w, b, mp_affine, *, stride: int = 1, bn: int = 0):
    N, T, V, P = prefix.shape
    bc = P // 3
    if bn <= 0:
        # ~2 MB of padded input per program
        vp = -(-V // 8) * 8
        lanes = -(-P // 128) * 128
        per = T * vp * lanes * 4
        bn = 1
        while bn * 2 <= N and N % (bn * 2) == 0 and bn * 2 * per <= (1 << 19):
            bn *= 2
    return pl.pallas_call(
        functools.partial(_kernel, bc=bc, stride=stride, T=T),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, T, V, P), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2, KS, bc, bc), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((2, bc), lambda i: (0, 0)),
            pl.BlockSpec((2, bc), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, T // stride, V, P),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, T // stride, V, P), prefix.dtype),
        interpret=jax.default_backend() != "tpu",
    )(prefix, w, b, mp_affine)


def ms_tcn_xla(prefix, w, b, mp_affine, *, stride: int = 1):
    N, T, V, P = prefix.shape
    bc = P // 3
    outs = []
    for i, d in enumerate(DILS):
        seg = prefix[..., i * bc:(i + 1) * bc]
        pad = (KS - 1) * d // 2
        y = lax.conv_general_dilated(
            seg, jnp.transpose(w[i], (0, 1, 2))[:, None].reshape(KS, 1, bc, bc),
            window_strides=(stride, 1), padding=[(pad, pad), (0, 0)],
            rhs_dilation=(d, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        outs.append(y + b[i])
    mp = lax.reduce_window(
        prefix[..., 2 * bc:], -jnp.inf, lax.max,
        (1, 3, 1, 1), (1, stride, 1, 1), [(0, 0), (1, 1), (0, 0), (0, 0)],
    )
    outs.append(mp * mp_affine[0] + mp_affine[1])
    return jnp.concatenate(outs, axis=-1)


def bench(n, t, v, c, stride=1):
    bc = c // 4
    rs = np.random.RandomState(0)
    prefix = jnp.asarray(rs.randn(n, t, v, 3 * bc), jnp.float32)
    w = jnp.asarray(rs.randn(2, KS, bc, bc) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(2, bc) * 0.1, jnp.float32)
    mp = jnp.asarray(np.stack([np.ones(bc), np.zeros(bc)]), jnp.float32)

    got = np.asarray(jax.jit(
        lambda p: ms_tcn_fused(p, w, b, mp, stride=stride))(prefix))
    want = np.asarray(jax.jit(
        lambda p: ms_tcn_xla(p, w, b, mp, stride=stride))(prefix))
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 2e-2, f"numerics mismatch rel {err}"

    def feed(out, a):
        if stride == 1:
            return (out * 0.5 + a[0] * 0.5,)
        return (a[0] + out.mean() * 1e-9,)

    dt_p = time_chained(
        lambda p: ms_tcn_fused(p, w, b, mp, stride=stride), feed, (prefix,),
        chain=60, iters=10)
    dt_x = time_chained(
        lambda p: ms_tcn_xla(p, w, b, mp, stride=stride), feed, (prefix,),
        chain=60, iters=10)
    log(f"T={t:3d} C={c:3d} bc={bc:3d} s={stride}: pallas {dt_p*1e6:8.1f} us"
        f"   xla {dt_x*1e6:8.1f} us   ({dt_x/dt_p:.2f}x)  rel_err {err:.1e}")


def main():
    log("backend:", jax.default_backend(), jax.devices())
    bench(64, 52, 20, 64)        # l2-4
    bench(64, 52, 20, 128, 2)    # l5
    bench(64, 26, 20, 128)       # l6-7
    bench(64, 26, 20, 256, 2)    # l8
    bench(64, 13, 20, 256)       # l9-10
    bench(32, 64, 25, 64)        # NTU shallow (x2 persons folded in N)


if __name__ == "__main__":
    main()
