#!/usr/bin/env python
"""CTR-GC kernel tuning harness: measure kernel variants on the real chip.

Sweeps the fused CTR-GC implementations (XLA einsum path, the shipped Pallas
kernel, and experimental variants) across the three shapes the CTRGCN
backbone actually runs (shallow/middle/deep blocks), verifying numerics
against the fp32 XLA oracle before timing. Usage:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tune_ctr_gc.py

An "edge" = one joint->joint contribution per (sample, frame): N*T*V*V.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def time_fn(fn, *args, iters=10, warmup=3, chain=50):
    """Per-call time with `chain` serial applications inside ONE dispatch.

    Through the tunneled TPU a single dispatch costs ~0.5-1.5 ms — orders of
    magnitude more than these kernels — so un-chained timing measures the
    tunnel, not the kernel. The op maps x3 -> out of identical shape, so the
    chain feeds each output back as the next x3 (a true serial dependency:
    no cross-iteration pipelining can hide kernel latency).
    """
    import jax

    x1, x2, x3, *rest = args

    def run(x1, x2, x3, *rest):
        def body(c, _):
            return fn(x1, x2, c, *rest), ()
        c, _ = jax.lax.scan(body, x3, None, length=chain)
        return c

    g = jax.jit(run)
    for _ in range(warmup):
        out = g(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / chain


# ---------------------------------------------------------------------------
# experimental variant: roll-diagonal kernel
#
# out[n,t,u,c] = sum_v M[n,u,v,c] x3[n,t,v,c] reorganised over the offset
# d = (v - u) mod V:
#
#   out += Md[n,u,c] * roll(x3, -d, joint axis)     for d in 0..V-1
#
# Every operand stays in its native (sublane=V, lane=C) tile layout — no
# mid-tensor slicing of x3, no T-broadcast materialisation; the only data
# movement is a constant -1 sublane roll of x3 per step. The diagonal
# adjacency Md comes from one big MXU matmul over a D tensor built with V
# small rolls of x2, and the static partition is passed pre-gathered in
# (d, u) layout: Ad[d, u] = A[u, (u+d) % V].
# ---------------------------------------------------------------------------


def make_diag_variant(bn_target_mb=4, chunk=0):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x1_ref, x2_ref, x3_ref, w4_ref, b4_ref, alpha_ref, Ad_ref,
               out_ref):
        alpha = alpha_ref[0, 0]
        BN, V, R = x1_ref.shape
        C = x3_ref.shape[-1]
        x1 = x1_ref[:]
        x2r = x2_ref[:]
        ds = []
        for d in range(V):
            ds.append(x1 - x2r)
            if d + 1 < V:
                x2r = pltpu.roll(x2r, V - 1, axis=1)
        dstack = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, d, u, R)
        m = jnp.dot(
            dstack.reshape(BN * V * V, R), w4_ref[:],
            preferred_element_type=jnp.float32,
        ).reshape(BN, V, V, C)
        m = (m + b4_ref[0][None, None, None, :]) * alpha \
            + Ad_ref[:][None, :, :, None]

        x3r = x3_ref[:]
        if chunk:  # flush accumulator through out_ref every `chunk` steps
            out_ref[:] = jnp.zeros(x3r.shape, jnp.float32)
            for d0 in range(0, V, chunk):
                acc = m[:, d0][:, None] * x3r
                if d0 + 1 < min(d0 + chunk, V) or d0 + chunk < V:
                    pass
                for d in range(d0 + 1, min(d0 + chunk, V)):
                    x3r = pltpu.roll(x3r, V - 1, axis=2)
                    acc = acc + m[:, d][:, None] * x3r
                out_ref[:] += acc
                if d0 + chunk < V:
                    x3r = pltpu.roll(x3r, V - 1, axis=2)
        else:
            acc = m[:, 0][:, None] * x3r
            for d in range(1, V):
                x3r = pltpu.roll(x3r, V - 1, axis=2)
                acc = acc + m[:, d][:, None] * x3r
            out_ref[:] = acc

    def run(x1, x2, x3, w4, b4, alpha, A):
        N, T, V, C = x3.shape
        R = x1.shape[-1]
        per_sample = (3 * T * V * C + 2 * V * V * C) * 4
        target = max(1, (bn_target_mb << 20) // per_sample)
        bn = 1
        while bn * 2 <= min(target, N) and N % (bn * 2) == 0:
            bn *= 2
        # Ad[d, u] = A[u, (u+d) % V]
        u = jnp.arange(V)[None, :]
        d = jnp.arange(V)[:, None]
        Ad = A[u, (u + d) % V]
        alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
        b4v = jnp.zeros((C,), x3.dtype) if b4 is None else b4
        return pl.pallas_call(
            kernel,
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((bn, V, R), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, V, R), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, T, V, C), lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, C), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda n: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((V, V), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bn, T, V, C), lambda n: (n, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, T, V, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * (V * V * R * C + T * V * V * C),
                bytes_accessed=4 * (2 * N * T * V * C + 2 * N * V * R + R * C),
                transcendentals=N * V * V * R,
            ),
            interpret=jax.default_backend() != "tpu",
        )(x1, x2, x3, w4, b4v.reshape(1, C), alpha2d, Ad)

    return run


# in-kernel einsum variant: same blocking as the shipped kernel but stage 2
# as a single jnp.einsum, letting Mosaic schedule the reduction
def make_einsum_variant(bn_target_mb=4):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x1_ref, x2_ref, x3_ref, w4_ref, b4_ref, alpha_ref, A_ref,
               out_ref):
        alpha = alpha_ref[0, 0]
        BN, V, R = x1_ref.shape
        C = x3_ref.shape[-1]
        d = jnp.tanh(x1_ref[:][:, :, None, :] - x2_ref[:][:, None, :, :])
        m = jnp.dot(
            d.reshape(BN * V * V, R), w4_ref[:],
            preferred_element_type=jnp.float32,
        ).reshape(BN, V, V, C)
        m = (m + b4_ref[0][None, None, None, :]) * alpha \
            + A_ref[:][None, :, :, None]
        out_ref[:] = jnp.einsum(
            "nuvc,ntvc->ntuc", m, x3_ref[:],
            preferred_element_type=jnp.float32,
        )

    def run(x1, x2, x3, w4, b4, alpha, A):
        N, T, V, C = x3.shape
        R = x1.shape[-1]
        per_sample = (2 * T * V * C + 2 * V * V * C) * 4
        target = max(1, (bn_target_mb << 20) // per_sample)
        bn = 1
        while bn * 2 <= min(target, N) and N % (bn * 2) == 0:
            bn *= 2
        alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
        b4v = jnp.zeros((C,), x3.dtype) if b4 is None else b4
        return pl.pallas_call(
            kernel,
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((bn, V, R), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, V, R), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, T, V, C), lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, C), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda n: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((V, V), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bn, T, V, C), lambda n: (n, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, T, V, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=jax.default_backend() != "tpu",
        )(x1, x2, x3, w4, b4v.reshape(1, C), alpha2d, A)

    return run


def main():
    import jax
    import jax.numpy as jnp

    from tamgcn_tpu.ops.aggregation import ctr_gc_fused_xla
    from tamgcn_tpu.ops.pallas.ctr_gc import ctr_gc_fused_pallas
    from tamgcn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")

    shapes = [  # (N, T, V, C, R): the three CTRGCN block regimes, batch 64
        (64, 52, 20, 64, 8),
        (64, 26, 20, 128, 16),
        (64, 13, 20, 256, 32),
    ]
    variants = {
        "xla": lambda: jax.jit(ctr_gc_fused_xla),
        "pallas_current": lambda: jax.jit(ctr_gc_fused_pallas),
        "diag_4mb": lambda: jax.jit(make_diag_variant(4)),
        "diag_8mb": lambda: jax.jit(make_diag_variant(8)),
        "diag_2mb": lambda: jax.jit(make_diag_variant(2)),
        "diag_4mb_chunk5": lambda: jax.jit(make_diag_variant(4, chunk=5)),
        "einsum_4mb": lambda: jax.jit(make_einsum_variant(4)),
    }

    for (n, t, v, c, r) in shapes:
        rs = np.random.RandomState(0)
        args = (
            jnp.asarray(rs.randn(n, v, r), jnp.float32),
            jnp.asarray(rs.randn(n, v, r), jnp.float32),
            jnp.asarray(rs.randn(n, t, v, c), jnp.float32),
            jnp.asarray(rs.randn(r, c) * 0.1, jnp.float32),
            jnp.asarray(rs.randn(c) * 0.1, jnp.float32),
            jnp.asarray([0.7], jnp.float32),
            jnp.asarray(rs.rand(v, v), jnp.float32),
        )
        edges = n * t * v * v
        oracle = np.asarray(jax.jit(ctr_gc_fused_xla)(*args))
        log(f"\nshape N={n} T={t} V={v} C={c} R={r}  ({edges/1e6:.1f} Medges)")
        for name, make in variants.items():
            try:
                fn = make()
                out = np.asarray(fn(*args))
                err = np.max(np.abs(out - oracle)) / max(
                    1e-6, float(np.max(np.abs(oracle)))
                )
                if err > 2e-2:
                    log(f"  {name:18s} NUMERICS FAIL rel={err:.2e}")
                    continue
                dt = time_fn(fn, *args)
                log(
                    f"  {name:18s} {dt*1e6:9.1f} us  "
                    f"{edges/dt/1e9:7.2f} Gedges/s  (rel_err {err:.1e})"
                )
            except Exception as e:
                log(f"  {name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
