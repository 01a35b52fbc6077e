#!/usr/bin/env python
"""Round-4 decomposition: backward kernel costs + fold/unfold overhead.

Times, per shape: fwd kernel, dx3 kernel, param kernel (separately), for
the tile and bcast forms; the XLA fold/unfold relayouts for the narrow-
channel (C=64) path; and the unfolded C=64 kernels (SC=192 lanes, 25% pad).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_bwd_decomp.py
"""
from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tamgcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tamgcn_tpu.ops.pallas.ctr_gc import (  # noqa: E402
    unit_ctr_gc_bwd_pallas,
    unit_ctr_gc_fwd_pallas,
)
from tamgcn_tpu.utils.timing import time_chained  # noqa: E402

S = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def args_for(n, t, v, c, r):
    rs = np.random.RandomState(0)
    x1 = jnp.asarray(rs.randn(n, S, v, r), jnp.float32)
    x2 = jnp.asarray(rs.randn(n, S, v, r), jnp.float32)
    x3 = jnp.asarray(rs.randn(n, t, v, S * c), jnp.float32)
    w4 = jnp.asarray(rs.randn(S, r, c) * 0.1, jnp.float32)
    b4 = jnp.asarray(rs.randn(S, c) * 0.1, jnp.float32)
    alpha = jnp.asarray([0.1], jnp.float32)
    A = jnp.asarray(rs.rand(S, v, v) * 0.02, jnp.float32)
    g = jnp.asarray(rs.randn(n, t, v, c), jnp.float32)
    return x1, x2, x3, w4, b4, alpha, A, g


def bench_kernels(n, t, v, c, r, forms=("tile", "bcast")):
    x1, x2, x3, w4, b4, alpha, A, g = args_for(n, t, v, c, r)
    log(f"--- N={n} T={t} V={v} C={c} (SC={S*c}) ---")
    for form in forms:
        fwd = functools.partial(unit_ctr_gc_fwd_pallas, form=form)

        def feed_f(out, a):
            return a[:2] + (jnp.concatenate([out] * S, -1) * 0.3,) + a[3:]

        dt_f = time_chained(fwd, feed_f, (x1, x2, x3, w4, b4, alpha, A),
                            chain=60, iters=10)

        # dx3 only: grab the dx3 output of the bwd (kernel 1); to time it
        # alone, call the underlying pallas_call via the public bwd but
        # select outputs — instead time full bwd and bwd-without-dx3 is not
        # separable; so time: full bwd, and a "both" variant feeding dx3.
        bwd = functools.partial(unit_ctr_gc_bwd_pallas, form=form)

        def feed_b(out, a):
            # out = (dx1, dx2, dx3, dw4, db4, dalpha, dA); feed dx3 -> x3
            return a[:2] + (out[2] * 0.3,) + a[3:]

        dt_b = time_chained(
            lambda x1, x2, x3, w4, b4, alpha, A: bwd(
                x1, x2, g, x3, w4, b4, alpha, A),
            feed_b, (x1, x2, x3, w4, b4, alpha, A), chain=40, iters=10)
        log(f"  {form:5s} fwd {dt_f*1e6:8.1f} us   full-bwd {dt_b*1e6:8.1f} us")


def bench_bwd_split(n, t, v, c, r, form="tile"):
    """Time dx3 kernel and param kernel separately by calling the module
    internals."""
    import tamgcn_tpu.ops.pallas.ctr_gc as K

    x1, x2, x3, w4, b4, alpha, A, g = args_for(n, t, v, c, r)

    # dx3 kernel only
    def dx3_only(x1, x2, g, w4, b4, alpha, A):
        N, S_, V, R = x1.shape
        T = g.shape[1]
        C = g.shape[-1]
        alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
        bn, bt = K._unit_block_n(N, T, V, C, S_)
        if form == "tile":
            bn = K._fit_tile_scratch(bn, S_, V, C)
        kern = (K._unit_bwd_dx3_kernel_tile if form == "tile"
                else K._unit_bwd_dx3_kernel_bcast)
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        scratch = ([pltpu.VMEM((bn, S_, V, V, C), jnp.float32)]
                   if form == "tile" else [])
        return pl.pallas_call(
            functools.partial(kern, c=C),
            grid=(N // bn, T // bt),
            in_specs=[
                pl.BlockSpec((bn, S_, V, R), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((bn, S_, V, R), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((bn, bt, V, C), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((S_, R, C), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((S_, 1, C), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((S_, V, V), lambda i, j: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bn, bt, V, S_ * C),
                                   lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, T, V, S_ * C), g.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=K._interpret_default(),
        )(x1, x2, g, w4, b4.reshape(S_, 1, C), alpha2d, A)

    def feed_dx3(out, a):
        return a[:2] + (out[..., :c] * 0.3,) + a[3:]

    dt_dx3 = time_chained(dx3_only, feed_dx3,
                          (x1, x2, g, w4, b4, alpha, A), chain=40, iters=10)

    # param kernel only
    def param_only(x1, x2, g, x3, w4, b4, alpha):
        N, S_, V, R = x1.shape
        T = g.shape[1]
        C = g.shape[-1]
        alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
        bn, bt = K._unit_bwd_blocks(N, T, V, C, S_)
        kern = (K._unit_bwd_param_kernel_tile if form == "tile"
                else K._unit_bwd_param_kernel_bcast)
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        return pl.pallas_call(
            functools.partial(kern, c=C),
            grid=(N // bn, T // bt),
            in_specs=[
                pl.BlockSpec((bn, S_, V, R), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((bn, S_, V, R), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((bn, bt, V, C), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((bn, bt, V, S_ * C), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((S_, R, C), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((S_, 1, C), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((bn, S_, V, R), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((bn, S_, V, R), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((S_, R, C), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((S_, 1, C), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((S_, V, V), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, S_, V, R), x1.dtype),
                jax.ShapeDtypeStruct((N, S_, V, R), x2.dtype),
                jax.ShapeDtypeStruct((S_, R, C), jnp.float32),
                jax.ShapeDtypeStruct((S_, 1, C), jnp.float32),
                jax.ShapeDtypeStruct((S_, V, V), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((bn, V, V, S_ * C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=K._interpret_default(),
        )(x1, x2, g, x3, w4, b4.reshape(S_, 1, C), alpha2d)

    def feed_p(out, a):
        return (a[0], a[1], a[2], a[3] + out[0].mean() * 1e-9) + a[4:]

    dt_p = time_chained(param_only, feed_p,
                        (x1, x2, g, x3, w4, b4, alpha), chain=40, iters=10)
    log(f"  {form:5s} split: dx3 {dt_dx3*1e6:8.1f} us   param {dt_p*1e6:8.1f} us")


def bench_fold(n=64, t=52, v=20, c=64, tf=2):
    """The XLA fold/unfold relayouts alone (fwd + transpose under AD)."""
    rs = np.random.RandomState(0)
    x3 = jnp.asarray(rs.randn(n, t, v, S * c), jnp.float32)

    def fold(x3s):
        N, T = x3s.shape[0], x3s.shape[1]
        xf = x3s.reshape(N, T // tf, tf, v, S, c)
        return jnp.transpose(xf, (0, 1, 3, 4, 2, 5)).reshape(
            N, T // tf, v, S * tf * c)

    def unfold(out):
        N = out.shape[0]
        o = out.reshape(N, t // tf, v, tf, c)
        return jnp.transpose(o, (0, 1, 3, 2, 4)).reshape(N, t, v, c)

    def feed(out, a):
        return (out.reshape(a[0].shape),)

    dt_fold = time_chained(fold, lambda o, a: (o.reshape(a[0].shape),),
                           (x3,), chain=60, iters=10)
    outx = jnp.asarray(rs.randn(n, t // tf, v, tf * c), jnp.float32)
    dt_unf = time_chained(unfold, lambda o, a: (o.reshape(a[0].shape),),
                          (outx,), chain=60, iters=10)
    log(f"fold (N,{t},{v},{S*c})->folded: {dt_fold*1e6:8.1f} us;  "
        f"unfold: {dt_unf*1e6:8.1f} us")


def main():
    log("backend:", jax.default_backend(), jax.devices())
    bench_fold()
    # deep layer
    bench_kernels(64, 13, 20, 256, 32)
    bench_bwd_split(64, 13, 20, 256, 32, form="tile")
    bench_bwd_split(64, 13, 20, 256, 32, form="bcast")
    # mid layer
    bench_kernels(64, 26, 20, 128, 16)
    bench_bwd_split(64, 26, 20, 128, 16, form="tile")
    # folded l2-4 equivalent (T=26, c=128) is the same shape as mid layer.
    # unfolded l2-4: SC=192 lanes
    bench_kernels(64, 52, 20, 64, 8)
    bench_bwd_split(64, 52, 20, 64, 8, form="tile")
    bench_bwd_split(64, 52, 20, 64, 8, form="bcast")


if __name__ == "__main__":
    main()
