#!/usr/bin/env python
"""Stage-2 schedule experiments for the fused CTR-GC kernel.

Measures, at the deep-layer benchmark shape (N=64, T=13, V=20, C=256, S=3),
the per-call time of several candidate VPU schedules for the aggregation

    out[t,u,c] = sum_v M[u,v,c] * x3[t,v,c]

against a pure-FMA issue-floor probe. The goal is to locate the real
VPU-issue floor on the v5e and find a schedule whose only per-step work is
the FMA itself (operand fetch folded into addressing, no roll/splat
relayouts).

Variants:
  bcast      production broadcast form (ops/pallas/ctr_gc.py)
  roll       production roll-diagonal form
  floor1     issue floor: V FMAs/sample-block, all operands register-reused,
             single serial accumulator chain
  floor4     same, 4 independent accumulator chains (exposes ILP)
  win        sublane-window: x3 doubled along V in VMEM scratch, step d reads
             the (V, SC) slice at sublane offset d (misaligned load test)
  flat       flat-lane window: x3 as (T, V*SC) rows, step d reads the lane
             window at d*SC (vreg-aligned -> pure addressing), M pre-laid
             out per-offset as (V_d, V*SC)

Timing-only for floor*/win/flat M content (fed a fake shared M); numerics of
the flat form are checked against the einsum oracle separately.
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

from tamgcn_tpu.ops.aggregation import _unit_ctr_gc_pallas  # noqa: E402,F401
from tamgcn_tpu.ops.pallas.ctr_gc import unit_ctr_gc_fwd_pallas  # noqa: E402
from tamgcn_tpu.utils.timing import time_chained  # noqa: E402

N, T, V, C, R, S = 64, 13, 20, 256, 32, 3
SC = S * C


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# floor probes: V FMA steps over the full (BT, V, SC) block, operands in
# registers (md pages differ per step, but no data movement between steps)
# --------------------------------------------------------------------------

def _floor_kernel(md_ref, x3_ref, out_ref, *, nacc: int):
    x3 = x3_ref[:].astype(jnp.float32)            # (1, BT, V, SC)
    accs = []
    for a0 in range(nacc):
        acc = md_ref[a0][None, None] * x3
        for d in range(a0 + nacc, V, nacc):
            acc = acc + md_ref[d][None, None] * x3
        accs.append(acc)
    res = accs[0]
    for a in accs[1:]:
        res = res + a
    out_ref[:] = res.astype(out_ref.dtype)


def make_floor(nacc):
    def call(md, x3):
        return pl.pallas_call(
            functools.partial(_floor_kernel, nacc=nacc),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((V, V, SC), lambda n: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, V, SC), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, V, SC), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, T, V, SC), jnp.float32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
            interpret=jax.default_backend() != "tpu",
        )(md, x3)
    return call


# --------------------------------------------------------------------------
# win: sublane-window form. x3 doubled along V in scratch; step d loads the
# (V, SC) slice at sublane offset d.
# --------------------------------------------------------------------------

def _win_kernel(m_ref, x3_ref, out_ref, scr_ref):
    x3 = x3_ref[:].astype(jnp.float32)            # (1, BT, V, SC)
    scr_ref[:, :, :V, :] = x3
    scr_ref[:, :, V:, :] = x3
    acc = m_ref[0][None, None] * scr_ref[:, :, 0:V, :]
    for d in range(1, V):
        acc = acc + m_ref[d][None, None] * scr_ref[:, :, d:d + V, :]
    out_ref[:] = acc.astype(out_ref.dtype)


def win_call(md, x3):
    return pl.pallas_call(
        _win_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((V, V, SC), lambda n: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, V, SC), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, V, SC), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, SC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, T, 2 * V, SC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )(md, x3)


# --------------------------------------------------------------------------
# tile: broadcast schedule with a REGISTER-RESIDENT accumulator. The floor
# probes show the binding resource is VMEM traffic (the full-width acc is
# read+written from VMEM every step: ~2 MB x 20 steps/sample). Tiling the
# lane axis keeps each acc tile (~BT*V/8 * W/128 vregs) in registers across
# all V accumulation steps: acc traffic drops from 20 r/w to 1 write.
# --------------------------------------------------------------------------

def _tile_kernel(m_ref, x3_ref, out_ref, *, lt: int, nacc: int = 1):
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
        out_ref[..., l0:l0 + lt] = acc


def make_tile(lt, nacc=1, bn=1):
    def call(md, x3):
        return pl.pallas_call(
            functools.partial(_tile_kernel, lt=lt, nacc=nacc),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((V, V, SC), lambda n: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, T, V, SC), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bn, T, V, SC), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, T, V, SC), jnp.float32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
            interpret=jax.default_backend() != "tpu",
        )(md, x3)
    return call


# --------------------------------------------------------------------------
# flat: lane-window form. x3 rows are (T, V*SC); the step-d window starts at
# lane d*SC (a multiple of 128 when C is) so the shifted read is pure vreg
# addressing. MD rows are the per-offset diagonals MD[d, u*SC+sc] =
# M[u, (u+d)%V, sc]; the doubled x3 implements the (u+d) mod V wrap.
# --------------------------------------------------------------------------

def _flat_kernel(md_ref, x3_ref, out_ref, scr_ref, *, subset_sum: bool):
    x3 = x3_ref[:].astype(jnp.float32)            # (1, BT, V*SC)
    scr_ref[:, :, :V * SC] = x3
    scr_ref[:, :, V * SC:] = x3
    acc = md_ref[0:1] * scr_ref[0, :, 0:V * SC]
    for d in range(1, V):
        acc = acc + md_ref[d:d + 1] * scr_ref[0, :, d * SC:d * SC + V * SC]
    if subset_sum:
        parts = []
        for u in range(V):
            seg = acc[:, u * SC:u * SC + C]
            for s in range(1, S):
                seg = seg + acc[:, u * SC + s * C:u * SC + (s + 1) * C]
            parts.append(seg)
        out_ref[0] = jnp.concatenate(parts, axis=-1).astype(out_ref.dtype)
    else:
        out_ref[0] = acc[:, :out_ref.shape[-1]].astype(out_ref.dtype)


def flat_call(mdflat, x3flat, subset_sum=True):
    outw = V * C if subset_sum else V * SC
    return pl.pallas_call(
        functools.partial(_flat_kernel, subset_sum=subset_sum),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((V, V * SC), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, V * SC), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, outw), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, outw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, T, 2 * V * SC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )(mdflat, x3flat)


def feed_simple(out, args):
    # thread a trivial dependency through the first arg to serialize
    return (args[0] + out[0, 0, :1].reshape(1).mean() * 1e-20,) + tuple(args[1:])


def main():
    rs = np.random.RandomState(0)
    log(f"backend={jax.default_backend()} dev={jax.devices()}")

    # ---------------- production forms (real op) ----------------
    args = (
        jnp.asarray(rs.randn(N, S, V, R), jnp.float32),
        jnp.asarray(rs.randn(N, S, V, R), jnp.float32),
        jnp.asarray(rs.randn(N, T, V, SC), jnp.float32),
        jnp.asarray(rs.randn(S, R, C) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(S, C) * 0.1, jnp.float32),
        jnp.asarray([0.1], jnp.float32),
        jnp.asarray(rs.rand(S, V, V) * 0.02, jnp.float32),
    )

    def feed_prod(out, a):
        return a[:2] + (jnp.concatenate([out] * S, -1) * 1e-3,) + a[3:]

    for form in ("bcast", "roll"):
        f = functools.partial(unit_ctr_gc_fwd_pallas, form=form)
        dt = time_chained(f, feed_prod, args, chain=30, iters=5)
        log(f"{form:8s} {dt*1e6:9.1f} us")

    # ---------------- probes (timing only) ----------------
    md = jnp.asarray(rs.randn(V, V, SC) * 0.05, jnp.float32)
    x3 = args[2]

    def feed_md(out, a):
        return (a[0] + out[0, 0, 0, :1].mean() * 1e-20, a[1])

    variants = (
        ("tile128", make_tile(128)),
        ("t128a2", make_tile(128, nacc=2)),
        ("t128a4", make_tile(128, nacc=4)),
        ("t128b2", make_tile(128, bn=2)),
        ("t128b4", make_tile(128, bn=4)),
        ("t128a2b2", make_tile(128, nacc=2, bn=2)),
        ("t256a2", make_tile(256, nacc=2)),
    )
    for name, call in variants:
        dt = time_chained(call, feed_md, (md, x3), chain=30, iters=5)
        log(f"{name:8s} {dt*1e6:9.1f} us")

    mdflat = jnp.asarray(rs.randn(V, V * SC) * 0.05, jnp.float32)
    x3flat = x3.reshape(N, T, V * SC)

    def feed_flat(out, a):
        return (a[0] + out[0, 0, :1].mean() * 1e-20, a[1])

    for ss in (True, False):
        f = functools.partial(flat_call, subset_sum=ss)
        dt = time_chained(f, feed_flat, (mdflat, x3flat), chain=30, iters=5)
        log(f"flat(ss={int(ss)}) {dt*1e6:7.1f} us")

    # ---------------- flat-form numerics vs oracle ----------------
    # out[t,u,sc] = sum_d MD[d, u*SC+sc] * x3[t, (u+d)%V, sc]
    mdr = np.asarray(mdflat).reshape(V, V, SC)     # [d, u, sc]
    x3n = np.asarray(x3)                           # [n, t, v, sc]
    m_full = np.zeros((V, V, SC), np.float32)      # [u, v, sc]
    for d in range(V):
        for u in range(V):
            m_full[u, (u + d) % V] = mdr[d, u]
    want = np.einsum("uvc,ntvc->ntuc", m_full, x3n)
    want = want.reshape(N, T, V, S, C).sum(3)
    got = np.asarray(flat_call(mdflat, x3flat, subset_sum=True)).reshape(N, T, V, C)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    log(f"flat numerics vs oracle: rel-max-err {err:.2e}")


if __name__ == "__main__":
    main()
