#!/usr/bin/env python
"""Round-4 backward-kernel schedule sweep: param phase-B loop order and
dx3 t-chunk size, at the three backbone kernel shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_bwd2.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tamgcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tamgcn_tpu.ops.pallas.ctr_gc import unit_ctr_gc_bwd_pallas  # noqa: E402
from tamgcn_tpu.ops.aggregation import unit_ctr_gc_xla  # noqa: E402
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


def check_numerics(n, t, v, c, r, form):
    """Gradients of the pallas bwd == XLA VJP at a small shape."""
    x1, x2, x3, w4, b4, alpha, A, g = args_for(n, t, v, c, r)

    def f_xla(*a):
        return jnp.sum(unit_ctr_gc_xla(*a) * g)

    with jax.default_matmul_precision("highest"):
        gx = jax.grad(f_xla, argnums=tuple(range(7)))(
            x1, x2, x3, w4, b4, alpha, A)
    os.environ["TAMGCN_CTR_GC_STAGE1_HIGHEST"] = "1"
    try:
        got = jax.jit(
            lambda *a: unit_ctr_gc_bwd_pallas(*a, form=form)
        )(x1, x2, g, x3, w4, b4, alpha, A)
    finally:
        del os.environ["TAMGCN_CTR_GC_STAGE1_HIGHEST"]
    names = ["dx1", "dx2", "dx3", "dw4", "db4", "dalpha", "dA"]
    for name, a, b in zip(names, got, gx):
        # phase C's MXU dots run at default (single-pass bf16) precision,
        # so dx1/dx2 carry ~1e-2 abs noise vs the f32-highest XLA reference;
        # exact-f32 logic equality is covered by the CPU interpret tests.
        # This check is a LOGIC guard for the schedule variants only.
        bb = np.asarray(b)
        scale = max(np.abs(bb).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), bb, rtol=5e-2, atol=1e-2 * scale,
            err_msg=f"{name} mismatch")
    log(f"  numerics ok ({form})")


def bench(n, t, v, c, r, form="tile"):
    x1, x2, x3, w4, b4, alpha, A, g = args_for(n, t, v, c, r)
    bwd = lambda *a: unit_ctr_gc_bwd_pallas(*a, form=form)  # noqa: E731

    def feed_b(out, a):
        return (a[0], a[1], a[2], out[2] * 0.3) + a[4:]

    dt = time_chained(
        lambda x1, x2, g, x3, w4, b4, alpha, A: bwd(
            x1, x2, g, x3, w4, b4, alpha, A),
        feed_b, (x1, x2, g, x3, w4, b4, alpha, A), chain=40, iters=10)
    return dt


def main():
    log("backend:", jax.default_backend(), jax.devices())
    # numerics first (small shape, both phase-B orders)
    for pb in ("v_outer", "t_outer"):
        os.environ["TAMGCN_PARAM_PHASEB"] = pb
        check_numerics(2, 8, 20, 128, 16, "tile")

    shapes = [(64, 13, 20, 256, 32), (64, 26, 20, 128, 16),
              (64, 26, 20, 256, 32)]
    for (n, t, v, c, r) in shapes:
        log(f"--- N={n} T={t} C={c} ---")
        for pb in ("v_outer", "t_outer"):
            os.environ["TAMGCN_PARAM_PHASEB"] = pb
            for tc in (4, 8, 13):
                os.environ["TAMGCN_TILE_TC"] = str(tc)
                dt = bench(n, t, v, c, r, form="tile")
                log(f"  tile pb={pb:8s} tc={tc:2d}: {dt*1e6:8.1f} us")
    os.environ.pop("TAMGCN_TILE_TC", None)


if __name__ == "__main__":
    main()
