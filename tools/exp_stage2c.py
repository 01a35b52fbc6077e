#!/usr/bin/env python
"""Sweep the production tile-form forward kernel's (tc, nacc) schedule knobs
at both benchmark shapes, vs the bcast production baseline."""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tamgcn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tamgcn_tpu.ops.pallas.ctr_gc import unit_ctr_gc_fwd_pallas  # noqa: E402
from tamgcn_tpu.utils.timing import time_chained  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_shape(n, t, v, c, r, s=3):
    rs = np.random.RandomState(0)
    args = (
        jnp.asarray(rs.randn(n, s, v, r), jnp.float32),
        jnp.asarray(rs.randn(n, s, v, r), jnp.float32),
        jnp.asarray(rs.randn(n, t, v, s * c), jnp.float32),
        jnp.asarray(rs.randn(s, r, c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(s, c) * 0.1, jnp.float32),
        jnp.asarray([0.1], jnp.float32),
        jnp.asarray(rs.rand(s, v, v) * 0.02, jnp.float32),
    )

    def feed(out, a):
        return a[:2] + (jnp.concatenate([out] * s, -1) * 1e-3,) + a[3:]

    log(f"shape T={t} C={c}")
    f = functools.partial(unit_ctr_gc_fwd_pallas, form="bcast")
    dt = time_chained(f, feed, args, chain=60, iters=10)
    log(f"  bcast        {dt*1e6:9.1f} us")
    for tc in (4, 8, 16):
        for nacc in (1, 2):
            os.environ["TAMGCN_TILE_TC"] = str(tc)
            os.environ["TAMGCN_TILE_NACC"] = str(nacc)
            f = functools.partial(unit_ctr_gc_fwd_pallas, form="tile")
            dt = time_chained(f, feed, args, chain=60, iters=10)
            log(f"  tile tc={tc:2d} a{nacc} {dt*1e6:9.1f} us")


def main():
    log(f"backend={jax.default_backend()}")
    bench_shape(64, 13, 20, 256, 32)
    bench_shape(64, 26, 20, 128, 16)


if __name__ == "__main__":
    main()
