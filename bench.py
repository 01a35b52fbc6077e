#!/usr/bin/env python
"""Benchmark: fused CTR-GC kernel + end-to-end CTR-GCN training throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The primary metric is CTR-GC aggregation throughput in edges/s/chip (an
"edge" = one joint->joint contribution aggregated per (sample, frame), i.e.
N*T*V*V per call per subset, the quantity BASELINE.json names). vs_baseline
is the speedup of the fused Pallas kernel over the XLA-einsum implementation
of the identical op on the same chip — the reference publishes no TPU (or
any) kernel numbers (BASELINE.md), so the XLA lowering of the reference's
own einsum formulation is the baseline.

Secondary lines (stderr): train-step samples/s for the full model, both
kernel paths, and speed-of-light context.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_kernel_chained(kernel, *args, chain=50, iters=10, warmup=3):
    """Per-call kernel time with `chain` serial applications in ONE dispatch,
    synchronized by an actual value fetch (utils.timing rationale: through
    the tunneled TPU, block_until_ready does not wait and a D2H fetch costs
    ~30 ms, so the chain amortizes a single hard sync over chain*iters
    applications). The op maps x3 -> out of identical shape, so the chain
    feeds each output back as the next x3: a true serial dependency that
    cross-iteration pipelining cannot hide.
    """
    from tamgcn_tpu.utils.timing import time_chained

    def feedback(out, c_args):
        return c_args[:2] + (out,) + c_args[3:]

    return time_chained(
        kernel, feedback, args, chain=chain, iters=iters, warmup=warmup
    )


def bench_kernel(n=64, t=52, v=20, c=64, r=8):
    import jax
    import jax.numpy as jnp

    from tamgcn_tpu.ops.aggregation import ctr_gc_fused_xla
    from tamgcn_tpu.ops.pallas.ctr_gc import ctr_gc_fused_pallas

    rs = np.random.RandomState(0)
    # contraction-stable scales: the chained timing feeds out -> x3, so the
    # effective adjacency must not blow values up over 50 applications
    args = (
        jnp.asarray(rs.randn(n, v, r), jnp.float32),
        jnp.asarray(rs.randn(n, v, r), jnp.float32),
        jnp.asarray(rs.randn(n, t, v, c), jnp.float32),
        jnp.asarray(rs.randn(r, c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(c) * 0.1, jnp.float32),
        jnp.asarray([0.1], jnp.float32),
        jnp.asarray(rs.rand(v, v) * 0.05, jnp.float32),
    )
    f_pallas = jax.jit(ctr_gc_fused_pallas)
    f_xla = jax.jit(ctr_gc_fused_xla)
    # numerics guard on-chip: XLA's einsum path uses default (bf16-input)
    # matmul precision on TPU, so allow bf16-level deviation here — exact
    # fp32 parity is gated in tests/test_pallas.py
    np.testing.assert_allclose(
        np.asarray(f_pallas(*args)), np.asarray(f_xla(*args)), rtol=5e-2, atol=1e-1
    )
    dt_pallas = time_kernel_chained(ctr_gc_fused_pallas, *args)
    dt_xla = time_kernel_chained(ctr_gc_fused_xla, *args)
    edges = n * t * v * v
    log(f"kernel shapes N={n} T={t} V={v} C={c} R={r}")
    log(f"  pallas: {dt_pallas*1e6:9.1f} us  {edges/dt_pallas/1e9:8.2f} Gedges/s")
    log(f"  xla:    {dt_xla*1e6:9.1f} us  {edges/dt_xla/1e9:8.2f} Gedges/s")
    return edges / dt_pallas, dt_xla / dt_pallas


def bench_train_step(batch=64):
    import jax
    import jax.numpy as jnp

    from tamgcn_tpu.models import create_ctrgcn_nucla
    from tamgcn_tpu.parallel.mesh import make_mesh
    from tamgcn_tpu.parallel.sharded import (
        init_sharded_state,
        make_packed_train_step,
    )
    from tamgcn_tpu.train.optim import make_optimizer

    # auto dispatch: Pallas where it wins (C >= 128), XLA fusion elsewhere
    model = create_ctrgcn_nucla(use_pallas=None)
    mesh = make_mesh()
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 3, 52, 20, 1), jnp.float32
    )
    labels = jnp.asarray(np.arange(batch) % 10, jnp.int32)
    tx = make_optimizer("SGD", 0.1, steps_per_epoch=50, step=[50])
    state = init_sharded_state(model, tx, mesh, x, jax.random.PRNGKey(0))
    # packed state: the jitted step's I/O is a handful of buffers, not the
    # ~2900-leaf state pytree (see tamgcn_tpu/train/packing.py)
    packed_step, flat, _ = make_packed_train_step(model, tx, state)
    step = jax.jit(packed_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    from tamgcn_tpu.utils.timing import time_step_chained

    with mesh:
        dt = time_step_chained(step, flat, (x, labels, rng), iters=30)
    log(f"train step: {dt*1e3:.2f} ms/step, {batch/dt:.1f} samples/s (batch {batch})")
    return batch / dt


def main():
    import jax

    from tamgcn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    # headline shape: the deep-layer CTR-GC (C=256), where the XLA path's
    # (N, V, V, C) intermediate is 4x the activation traffic
    edges_per_s, speedup = bench_kernel(n=64, t=13, v=20, c=256, r=32)
    bench_kernel(n=64, t=52, v=20, c=64, r=8)  # shallow layer, context
    try:
        samples_per_s = bench_train_step()
        log(f"train throughput: {samples_per_s:.1f} samples/s")
    except Exception as e:  # keep the primary metric even if train bench dies
        log(f"train bench failed: {e}")
    print(
        json.dumps(
            {
                "metric": "ctr_gc_fused_edges_per_s_per_chip",
                "value": round(edges_per_s / 1e9, 4),
                "unit": "Gedges/s",
                "vs_baseline": round(speedup, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
