#!/usr/bin/env python
"""Focused stage-2 probes: repeatability + bf16 packing.

Repeats the best register-tiled schedule several times (run-to-run variance
was ~20% in exp_stage2) and probes whether bf16 operands change VPU
throughput (packed-lane execution) at the deep-layer shape.
"""
from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tamgcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tamgcn_tpu.ops.pallas.ctr_gc import unit_ctr_gc_fwd_pallas  # noqa: E402
from tamgcn_tpu.utils.timing import time_chained  # noqa: E402

N, T, V, C, R, S = 64, 13, 20, 256, 32, 3
SC = S * C


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _tile_kernel(m_ref, x3_ref, out_ref, *, lt: int, nacc: int, bf16: bool):
    for l0 in range(0, SC, lt):
        accs = []
        for a0 in range(nacc):
            acc = (m_ref[a0, :, l0:l0 + lt][None, None]
                   * x3_ref[:, :, a0:a0 + 1, l0:l0 + lt])
            for v in range(a0 + nacc, V, nacc):
                acc = acc + (m_ref[v, :, l0:l0 + lt][None, None]
                             * x3_ref[:, :, v:v + 1, l0:l0 + lt])
            accs.append(acc)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        out_ref[..., l0:l0 + lt] = acc.astype(out_ref.dtype)


def make_tile(lt, nacc=1, dtype=jnp.float32):
    def call(md, x3):
        return pl.pallas_call(
            functools.partial(_tile_kernel, lt=lt, nacc=nacc,
                              bf16=dtype == jnp.bfloat16),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((V, V, SC), lambda n: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, V, SC), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, V, SC), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, T, V, SC), dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
            interpret=jax.default_backend() != "tpu",
        )(md.astype(dtype), x3.astype(dtype))
    return call


def main():
    rs = np.random.RandomState(0)
    log(f"backend={jax.default_backend()}")
    md = jnp.asarray(rs.randn(V, V, SC) * 0.05, jnp.float32)
    x3 = jnp.asarray(rs.randn(N, T, V, SC), jnp.float32)
    args = (
        jnp.asarray(rs.randn(N, S, V, R), jnp.float32),
        jnp.asarray(rs.randn(N, S, V, R), jnp.float32),
        x3,
        jnp.asarray(rs.randn(S, R, C) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(S, C) * 0.1, jnp.float32),
        jnp.asarray([0.1], jnp.float32),
        jnp.asarray(rs.rand(S, V, V) * 0.02, jnp.float32),
    )

    def feed_md(out, a):
        return (a[0] + out[0, 0, 0, :1].astype(jnp.float32).mean() * 1e-20,
                a[1])

    def feed_prod(out, a):
        return a[:2] + (jnp.concatenate([out] * S, -1) * 1e-3,) + a[3:]

    cands = {
        "bcast": (functools.partial(unit_ctr_gc_fwd_pallas, form="bcast"),
                  feed_prod, args),
        "t128a2": (make_tile(128, 2), feed_md, (md, x3)),
        "t128a2bf": (make_tile(128, 2, jnp.bfloat16), feed_md, (md, x3)),
        "t128a3": (make_tile(128, 3), feed_md, (md, x3)),
    }
    for rep in range(3):
        for name, (f, feed, a) in cands.items():
            dt = time_chained(f, feed, a, chain=30, iters=10)
            log(f"rep{rep} {name:9s} {dt*1e6:9.1f} us")


if __name__ == "__main__":
    main()
