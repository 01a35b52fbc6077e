"""Fused CTR-GC Pallas TPU kernel: dynamic-topology refine + aggregate.

Computes, per sample n (reference models/ctrgcn.py:172-177 semantics):

    D[u,v,r] = tanh(x1[u,r] - x2[v,r])              # SDDMM-shaped pairwise op
    M[u,v,c] = (D[u,v,:] @ w4[:,c] + b4[c]) * alpha + A[u,v]
    out[t,u,c] = sum_v M[u,v,c] * x3[t,v,c]          # per-channel aggregation

entirely in VMEM. The XLA path materialises M — an (N, V, V, C) tensor that
is 4x larger than the activations themselves (26 MB at N=64, C=256, V=20) —
to HBM and reads it back; this kernel keeps the whole refine+aggregate chain
on-chip, which matters because the op is bandwidth-bound (arithmetic
intensity ~V/2 FLOPs/byte on x3 traffic).

Layout: channels ride the 128-lane axis; the joint axis V (20/25) is
unrolled. The production schedules are the UNIT-level kernels further down
(one kernel for all three adjacency partitions); the round-3 default is the
register-tiled form — see docs/KERNELS.md for the design history
(roll-diagonal -> broadcast -> register-tiled) and measurements.

Backward is a custom VJP: x3's gradient reuses the same fused kernel with M
transposed in (u, v) (aggregation is linear in x3), and the small parameter
gradients (w4, b4, alpha, A, x1, x2) are XLA einsums over the recomputed D —
they touch V²-sized tensors only.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_precision(mm_dtype):
    """Stage-1 MXU precision. Production default is single-pass bf16 (the
    same choice XLA's default f32 path makes; HIGHEST costs ~100 us of the
    ~250 us deep-shape kernel — Mosaic supports only DEFAULT/HIGHEST, no
    3-pass HIGH). TAMGCN_CTR_GC_STAGE1_HIGHEST=1 (read at trace time)
    switches stage 1 to multi-pass HIGHEST so the bench's numerics guard
    can compare the FULL kernel schedule against an f32 `highest` XLA
    reference at rtol 1e-3 — any logic regression in the roll/broadcast/
    tile indexing or accumulation fails that check exactly."""
    if os.environ.get("TAMGCN_CTR_GC_STAGE1_HIGHEST"):
        return jax.lax.Precision.HIGHEST
    return None


def _default_form(packed_lanes: int) -> str:
    """Schedule default by packed lane width S*C (round-4 measurements, v5e):

      * >= 384 lanes (3+ vregs): the register-tiled form wins — its 128-lane
        output tiles are full vregs (fwd 269 vs 415 us at S*C=768);
      * < 384 lanes (C=64 -> 192 lanes): the full-width broadcast form wins —
        the tile form's per-subset c=64 tiles are HALF-vreg ops, while the
        broadcast chain runs 192->256-lane padded full-width FMAs
        (fwd 493 vs 571 us, param bwd 815 vs 1177 us at T=52, C=64).

    TAMGCN_CTR_GC_FORM overrides both (benchmarking/regression bisection).
    """
    return "tile" if packed_lanes >= 384 else "bcast"


def _interpret_default() -> bool:
    """Pallas interpret mode for this process.

    Keys on the process-level default backend at TRACE time, not the device
    the computation ultimately lands on — Pallas offers no per-trace device
    hook. Mixed-backend callers (e.g. a CPU dryrun mesh alongside a TPU
    default backend) must force the XLA path instead (use_pallas=False), as
    the trainer and dryrun_multichip do. TAMGCN_PALLAS_INTERPRET=0/1
    overrides for debugging either mode.
    """
    env = os.environ.get("TAMGCN_PALLAS_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "tpu"



def _fused_kernel(x1_ref, x2_ref, x3_ref, w4_ref, b4_ref, alpha_ref, A_ref,
                  out_ref, *, transpose_m: bool, block_n: int):
    """One grid step = `block_n` samples. Refs:
    x1 (BN,V,R)  x2 (BN,V,R)  x3 (BN,T,V,C)  w4 (R,C)  b4 (1,C)
    alpha (1,1) SMEM          A (V,V)        out (BN,T,V,C)

    Per sample: V small (V,R)@(R,C) MXU matmuls build the refined-adjacency
    rows on the fly; the aggregation is V broadcast-multiply-reduce VPU ops
    over (T, V, C) tiles (C on lanes). Blocking over samples amortises the
    per-program latency and lets Mosaic pipeline the HBM<->VMEM DMAs.
    """
    alpha = alpha_ref[0, 0]
    b4 = b4_ref[0]  # (C,)
    BN, V, R = x1_ref.shape
    C = x3_ref.shape[-1]

    x1 = x1_ref[:]  # (BN, V, R)
    x2 = x2_ref[:]  # (BN, V, R)
    x3 = x3_ref[:]  # (BN, T, V, C)
    # out[n, t, i, c] = sum_j M_eff[n, i, j, c] * x3[n, t, j, c].
    # Stage 1 (MXU): ALL of the block's dynamic-adjacency entries in one
    # (BN*V*V, R) @ (R, C) matmul — thousands of rows keep the systolic
    # array busy, vs the V=20-row matmuls a per-sample/per-joint loop emits.
    # m_eff is laid out [n, j, i, c] (j = input joint, i = output joint) so
    # stage 2 slices it on its leading-of-(j,i) axis.
    if transpose_m:
        # M^T aggregation (dL/dx3): m_eff[j, i] = M[j, i]
        d = jnp.tanh(x1[:, :, None, :] - x2[:, None, :, :])  # (BN, j, i, R)
        a_eff = A_ref[:]
    else:
        # forward: m_eff[j, i] = M[i, j]
        d = jnp.tanh(x1[:, None, :, :] - x2[:, :, None, :])  # (BN, j, i, R)
        a_eff = A_ref[:].T
    m = jnp.dot(
        d.reshape(BN * V * V, R), w4_ref[:], preferred_element_type=jnp.float32
    ).reshape(BN, V, V, C)
    m = (m + b4[None, None, None, :]) * alpha + a_eff[None, :, :, None]

    # Stage 2 (VPU): V broadcast-FMA steps over the full block, accumulated
    # in short value chains that are flushed THROUGH out_ref — each store
    # kills the chain's temporaries, so only `chunk` (BN, T, V, C) tiles are
    # ever live (a fully unrolled value-chain overflows scoped VMEM; a
    # fori_loop defeats Mosaic's vectorizer and runs ~2x slower).
    chunk = 5
    out_ref[:] = jnp.zeros(x3.shape, jnp.float32)
    for j0 in range(0, V, chunk):
        acc = x3[:, :, j0:j0 + 1, :] * m[:, j0, :, :][:, None, :, :]
        for j in range(j0 + 1, min(j0 + chunk, V)):
            acc = acc + x3[:, :, j:j + 1, :] * m[:, j, :, :][:, None, :, :]
        out_ref[:] += acc


def _pick_block_n(n: int, t: int, v: int, c: int) -> int:
    """Samples per program: target ~3 MB of x3+out+m+acc VMEM (padded),
    power-of-2 divisor.

    Sized against Mosaic's PADDED tile shapes — V rounds up to 8 sublanes,
    C to 128 lanes — and counting the live accumulator chains alongside
    x3/out/m. Undercounting here overflows the 16 MB scoped-VMEM stack at
    narrow C (where lane padding doubles every tensor), which shows up only
    when XLA embeds the kernel in a larger program.
    """
    vp = -(-v // 8) * 8
    cp = -(-c // 128) * 128
    per_sample = (3 * t * vp * cp + v * vp * cp) * 4
    target = max(1, (3 << 20) // max(per_sample, 1))
    bn = 1
    while bn * 2 <= min(target, n) and n % (bn * 2) == 0:
        bn *= 2
    return bn


def _fused_pallas_call(x1, x2, x3, w4, b4, alpha, A, *, transpose_m=False):
    N, T, V, C = x3.shape
    R = x1.shape[-1]
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    b4 = jnp.zeros((C,), x3.dtype) if b4 is None else b4
    bn = _pick_block_n(N, T, V, C)
    kernel = functools.partial(_fused_kernel, transpose_m=transpose_m, block_n=bn)
    flops = 2 * N * (V * V * R * C + T * V * V * C)
    return pl.pallas_call(
        kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, V, R), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, V, R), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, T, V, C), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda n: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((V, V), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, T, V, C), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, T, V, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * N * T * V * C + 2 * N * V * R + R * C),
            transcendentals=N * V * V * R,
        ),
        # off-TPU (tests, CPU dry runs) the kernel runs in interpreter mode
        interpret=_interpret_default(),
    )(x1, x2, x3, w4, b4.reshape(1, C), alpha2d, A)


@jax.custom_vjp
def ctr_gc_fused_pallas(x1, x2, x3, w4, b4, alpha, A):
    """Fused refine+aggregate; signature matches ops.aggregation.ctr_gc_fused_xla."""
    return _fused_pallas_call(x1, x2, x3, w4, b4, alpha, A)


def _fwd(x1, x2, x3, w4, b4, alpha, A):
    out = _fused_pallas_call(x1, x2, x3, w4, b4, alpha, A)
    return out, (x1, x2, x3, w4, b4, alpha, A)


def _bwd(res, g):
    x1, x2, x3, w4, b4, alpha, A = res
    has_b4 = b4 is not None
    b4v = jnp.zeros((x3.shape[-1],), x3.dtype) if b4 is None else b4

    # dx3 via the same fused kernel with M transposed in (u, v):
    # dx3[t,v,c] = sum_u M[u,v,c] g[t,u,c]
    dx3 = _fused_pallas_call(x1, x2, g, w4, b4v, alpha, A, transpose_m=True)

    # dM[u,v,c] = sum_t g[t,u,c] x3[t,v,c]  (small: N,V,V,C but only in bwd)
    dm = jnp.einsum("ntuc,ntvc->nuvc", g, x3, preferred_element_type=jnp.float32)
    d = jnp.tanh(x1[:, :, None, :] - x2[:, None, :, :])  # (N, U, V, R)
    dA = jnp.sum(dm, axis=(0, 3))
    dp = dm * alpha  # dL/dP where P = D @ w4 + b4
    dalpha_full = jnp.sum(
        dm * (jnp.einsum("nuvr,rc->nuvc", d, w4) + b4v)
    )
    dalpha = jnp.reshape(dalpha_full, jnp.shape(alpha))
    db4 = jnp.sum(dp, axis=(0, 1, 2)) if has_b4 else None
    dw4 = jnp.einsum("nuvr,nuvc->rc", d, dp, preferred_element_type=jnp.float32)
    dd = jnp.einsum("nuvc,rc->nuvr", dp, w4, preferred_element_type=jnp.float32)
    dpre = dd * (1.0 - d * d)
    dx1 = jnp.sum(dpre, axis=2)
    dx2 = -jnp.sum(dpre, axis=1)
    return dx1, dx2, dx3, dw4, db4, dalpha, dA


ctr_gc_fused_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Unit-level fused op: the THREE adjacency-partition CTR-GC branches of one
# unit_gcn (reference models/ctrgcn.py:246-254) in a single kernel.
#
# Fusing the subsets changes the op's economics on TPU:
#   * x3 arrives as the packed conv3 output (N, T, V, S*C) — the layout the
#     model naturally produces — so no relayout between conv and kernel;
#   * the output is written ONCE (previously 3 kernel outputs + 2 adds);
#   * one kernel launch per unit_gcn instead of three.
#
# Stage 2 runs as a ROLL-DIAGONAL aggregation: reorganised over the joint
# offset d = (v - u) mod V, every VPU step is one full-width FMA of the
# packed (BN, BT, V, S*C) block against the d-th diagonal of the refined
# adjacency, with a single constant -1 sublane roll of x3 between steps —
# no per-joint 1-sublane slicing anywhere. Measured (tunneled v5e, chained
# timing, vs the per-joint slice form): 2138 -> 910 us at (T=52, C=64),
# 1157 -> 653 us at (T=26, C=128), 848 -> 697 us at (T=13, C=256).
#
# The backward is TWO kernels sharing the same structure: dx3 via
# transposed-diagonal rolls of g, and a parameter-gradient kernel that
# accumulates dm (diagonal layout) in a VMEM scratch across T-blocks and
# derives ALL parameter gradients in-kernel via two small MXU matmuls per
# subset — the (N, S, V, V, C) dm tensor (78 MB at C=256) and the einsum
# chain XLA previously ran on it never touch HBM. End-to-end CTRGCN train
# step: 57.3 -> 47.9 ms (batch 64, f32).
# ---------------------------------------------------------------------------

S_SUBSETS = 3


def _unit_fwd_kernel(x1_ref, x2_ref, x3_ref, w4_ref, b4_ref, alpha_ref, Ad_ref,
                     out_ref, *, c: int):
    """Roll-diagonal forward. x1,x2 (BN,S,V,R); x3 (BN,BT,V,S*C); w4 (S,R,C);
    b4 (S,1,C); Ad (S,V,V) pre-gathered diagonals Ad[s,d,u] = A[s,u,(u+d)%V];
    out (BN,BT,V,C) = sum_s sum_v m_s[u,v,c] * x3_s[t,v,c].

    The aggregation is reorganised over the joint offset d = (v - u) mod V:

        out += md[:, d] * roll(x3, -d, joint axis)       d = 0..V-1

    so every VPU step is a FULL-width (BN, BT, V, S*C) FMA — no 1-sublane
    slicing, and one roll of the packed x3 serves all three subsets at once
    (measured ~3x over the per-joint slice form at T=52, C=64). md is built
    from V cheap (BN, V, R) rolls of x2 and one MXU matmul per subset:
    md[d, u] = M[u, (u+d) % V]. Long T*S*C shapes are split over the second
    grid dim (md recomputed per T-block — MXU work that is cheap next to the
    VPU stage) so the roll-chain buffers stay inside scoped VMEM."""
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    # Mixed precision: bf16 activations put the stage-1 matmul on the MXU's
    # native bf16 path (f32 matmuls cost ~4 passes); accumulation stays f32
    # via preferred_element_type. tanh and stage 2 always run f32 on the VPU.
    mm_dtype = jnp.bfloat16 if x3_ref.dtype == jnp.bfloat16 else jnp.float32
    mds = []
    for s in range(S):
        # bf16-safe: inputs may be bf16, all arithmetic runs f32 in VMEM
        x1 = x1_ref[:, s].astype(jnp.float32)
        x2r = x2_ref[:, s].astype(jnp.float32)
        ds = []
        for dd in range(V):
            ds.append(x1 - x2r)  # at offset dd: x2[(u+dd) % V]
            if dd + 1 < V:
                x2r = pltpu.roll(x2r, V - 1, axis=1)
        dstack = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, d, u, R)
        md = jnp.dot(dstack.reshape(BN * V * V, R).astype(mm_dtype),
                     w4_ref[s].astype(mm_dtype),
                     preferred_element_type=jnp.float32,
                     precision=_mm_precision(mm_dtype)).reshape(BN, V, V, c)
        mds.append((md + b4_ref[s][None]) * alpha
                   + Ad_ref[s][None, :, :, None])
    # packed stage 2: 20 FULL-width (BN, BT, V, S*c) FMAs (one shared roll
    # chain for all three subsets) measured ~2x the per-subset 60-FMA form
    mdcat = jnp.concatenate(mds, axis=-1)  # (BN, d, u, S*c)
    x3r = x3_ref[:].astype(jnp.float32)    # (BN, BT, V, S*c)
    acc = mdcat[:, 0][:, None] * x3r
    for dd in range(1, V):
        x3r = pltpu.roll(x3r, V - 1, axis=2)
        acc = acc + mdcat[:, dd][:, None] * x3r
    res = acc[..., 0:c]
    for s in range(1, S):
        res = res + acc[..., s * c:(s + 1) * c]
    out_ref[:] = res.astype(out_ref.dtype)


def _unit_fwd_kernel_bcast(x1_ref, x2_ref, x3_ref, w4_ref, b4_ref, alpha_ref,
                           At_ref, out_ref, *, c: int):
    """Broadcast-form forward: same op as _unit_fwd_kernel, different VPU
    schedule. x1,x2 (BN,S,V,R); x3 (BN,BT,V,S*C); At (S,V,V) = A transposed
    (At[s,v,u] = A[s,u,v]); out (BN,BT,V,C).

    The roll-diagonal chain serialises V misaligned sublane shuffles of the
    WHOLE x3 block (each roll feeds the next — a dependency chain of
    relayouts, measured ~8x the pure-FMA floor). This form iterates over the
    SOURCE joint v instead:

        acc[:, t, u, :] += mT[v, u] * x3[t, v]          v = 0..V-1

    Every step multiplies a contiguous mT page (v is a leading index of the
    (BN, V_v, V_u, S*C) tensor — free to address) by a 1-sublane broadcast
    of x3[:, :, v, :]: the only data movement is one sublane splat per step,
    and the V steps are independent (no serial shuffle chain). Stage 1
    builds mT[v, u] = tanh(x1[u] - x2[v]) @ w4 with the same per-v sublane
    broadcasts of x2 — no rolls anywhere in the kernel."""
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    # bf16 activations -> MXU-native bf16 stage-1 matmul, f32 accumulation
    mm_dtype = jnp.bfloat16 if x3_ref.dtype == jnp.bfloat16 else jnp.float32
    mts = []
    for s in range(S):
        x1 = x1_ref[:, s].astype(jnp.float32)   # (BN, V_u, R)
        x2 = x2_ref[:, s].astype(jnp.float32)
        ds = []
        for v in range(V):
            # D^T[v, u] = x1[u] - x2[v]: one sublane broadcast per source
            ds.append(x1 - x2[:, v:v + 1, :])
        dstack = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, v, u, R)
        mt = jnp.dot(dstack.reshape(BN * V * V, R).astype(mm_dtype),
                     w4_ref[s].astype(mm_dtype),
                     preferred_element_type=jnp.float32,
                     precision=_mm_precision(mm_dtype)).reshape(BN, V, V, c)
        mts.append((mt + b4_ref[s][None]) * alpha
                   + At_ref[s][None, :, :, None])
    mtcat = jnp.concatenate(mts, axis=-1)       # (BN, v, u, S*c)
    x3r = x3_ref[:].astype(jnp.float32)         # (BN, BT, v, S*c)
    acc = mtcat[:, 0][:, None] * x3r[:, :, 0:1, :]
    for v in range(1, V):
        acc = acc + mtcat[:, v][:, None] * x3r[:, :, v:v + 1, :]
    res = acc[..., 0:c]
    for s in range(1, S):
        res = res + acc[..., s * c:(s + 1) * c]
    out_ref[:] = res.astype(out_ref.dtype)


def _unit_fwd_kernel_tile(x1_ref, x2_ref, x3_ref, w4_ref, b4_ref, alpha_ref,
                          At_ref, out_ref, mt_scr, *, c: int, lt: int = 128,
                          nacc: int = 1):
    """Register-tiled broadcast forward (round-3 default): same math as
    _unit_fwd_kernel_bcast, restructured around the measured bottleneck.

    The full-width broadcast schedule reads AND writes the whole (BN, BT, V,
    S*C) accumulator from VMEM on every one of the V steps (~2 MB x 20
    per sample at the deep shape) — probes show that VMEM traffic, not FMA
    issue, binds it (a pure-FMA chain with register-reused operands measures
    SLOWER than the production kernel; tools/exp_stage2.py). This schedule
    tiles the OUTPUT lane axis: each (BN, BT, V, lt<=128) accumulator tile
    stays in registers across all S*V accumulation steps (two interleaved
    chains for ILP) and is written once — and because the chain runs over
    subsets as well as source joints, the subset reduction costs nothing
    extra. Measured 365 us vs 460 us for the full-width broadcast stage-2
    at (N=64, T=13, C=256) on the v5e.
    """
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    mm_dtype = jnp.bfloat16 if x3_ref.dtype == jnp.bfloat16 else jnp.float32

    # stage 1 depends only on the sample block: build the scratch once per
    # sample block (T is the inner grid dim, so j==0 runs first and the
    # scratch persists across the T-blocks of one i)
    @pl.when(pl.program_id(1) == 0)
    def _stage1():
        for s in range(S):
            x1 = x1_ref[:, s].astype(jnp.float32)   # (BN, V_u, R)
            x2 = x2_ref[:, s].astype(jnp.float32)
            ds = []
            for v in range(V):
                ds.append(x1 - x2[:, v:v + 1, :])   # D^T[v, u]
            dstack = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, v, u, R)
            mt = jnp.dot(dstack.reshape(BN * V * V, R).astype(mm_dtype),
                         w4_ref[s].astype(mm_dtype),
                         preferred_element_type=jnp.float32,
                     precision=_mm_precision(mm_dtype)).reshape(BN, V, V, c)
            # through a VMEM scratch: stage-2 then reads (u, lane-tile)
            # slices from a REF with plain addressing — slicing the live
            # VALUE makes Mosaic relayout/spill the whole tensor per use
            mt_scr[:, s] = ((mt + b4_ref[s][None]) * alpha
                            + At_ref[s][None, :, :, None])
    BT = x3_ref.shape[1]
    tc = int(os.environ.get("TAMGCN_TILE_TC", "4"))
    nacc = int(os.environ.get("TAMGCN_TILE_NACC", str(nacc)))
    # stage 2: per (t-chunk, 128-lane) out tile, one register-resident chain
    # over all (s, v) terms; the t-chunk bounds the live accumulator at
    # tc * V/8 * lt/128 vregs per chain so Mosaic does not spill it, and
    # `nacc` interleaved partial chains expose ILP
    steps = [(s, v) for s in range(S) for v in range(V)]
    for t0 in range(0, BT, tc):
        th = min(tc, BT - t0)
        for l0 in range(0, c, lt):
            w = min(lt, c - l0)
            accs = []
            for a0 in range(nacc):
                acc = None
                for s, v in steps[a0::nacc]:
                    term = (
                        mt_scr[:, s, v, :, l0:l0 + w][:, None]
                        * x3_ref[:, t0:t0 + th, v:v + 1,
                                 s * c + l0:s * c + l0 + w]
                        .astype(jnp.float32)
                    )
                    acc = term if acc is None else acc + term
                accs.append(acc)
            res = accs[0]
            for a in accs[1:]:
                res = res + a
            out_ref[:, t0:t0 + th, :, l0:l0 + w] = res.astype(out_ref.dtype)


def _dx3_tile_stages(x1_ref, x2_ref, g_ref, w4_ref, b4_ref, alpha, A_ref,
                     m_scr, write_tile, *, c: int, lt: int, nacc: int):
    """Shared stages of the register-tiled data gradient: stage 1 builds
    the refined adjacency into m_scr once per sample block; stage 2
    accumulates each (BN, th, V, w) dx3 tile in registers over the V
    source joints and hands it to `write_tile(t0, th, s, l0, w, res)` —
    the unfused kernel writes the output ref, the conv3-fused twin a VMEM
    scratch. One body so the TAMGCN_TILE_TC/NACC knobs and the
    mm_dtype/precision policy cannot diverge between the two."""
    BN, S, V, R = x1_ref.shape
    mm_dtype = jnp.bfloat16 if g_ref.dtype == jnp.bfloat16 else jnp.float32

    # stage 1 depends only on the sample block — once per sample block
    @pl.when(pl.program_id(1) == 0)
    def _stage1():
        for s in range(S):
            x1 = x1_ref[:, s].astype(jnp.float32)
            x2 = x2_ref[:, s].astype(jnp.float32)   # (BN, V_v, R)
            ds = []
            for u in range(V):
                ds.append(x1[:, u:u + 1, :] - x2)   # D[u, v]
            dstack = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, u, v, R)
            m = jnp.dot(dstack.reshape(BN * V * V, R).astype(mm_dtype),
                        w4_ref[s].astype(mm_dtype),
                        preferred_element_type=jnp.float32,
                     precision=_mm_precision(mm_dtype)).reshape(BN, V, V, c)
            m_scr[:, s] = ((m + b4_ref[s][None]) * alpha
                           + A_ref[s][None, :, :, None])
    BT = g_ref.shape[1]
    tc = int(os.environ.get("TAMGCN_TILE_TC", "4"))
    nacc = int(os.environ.get("TAMGCN_TILE_NACC", str(nacc)))
    for t0 in range(0, BT, tc):
        th = min(tc, BT - t0)
        for s in range(S):
            for l0 in range(0, c, lt):
                w = min(lt, c - l0)
                accs = []
                for a0 in range(nacc):
                    acc = None
                    for u in range(a0, V, nacc):
                        term = (
                            m_scr[:, s, u, :, l0:l0 + w][:, None]
                            * g_ref[:, t0:t0 + th, u:u + 1, l0:l0 + w]
                            .astype(jnp.float32)
                        )
                        acc = term if acc is None else acc + term
                    accs.append(acc)
                res = accs[0]
                for a in accs[1:]:
                    res = res + a
                write_tile(t0, th, s, l0, w, res)
    return mm_dtype


def _unit_bwd_dx3_kernel_tile(x1_ref, x2_ref, g_ref, w4_ref, b4_ref,
                              alpha_ref, A_ref, dx3_ref, m_scr, *, c: int,
                              lt: int = 128, nacc: int = 1):
    """Register-tiled data gradient: dx3_s[t,v,c] = sum_u M_s[u,v,c] g[t,u,c]
    with each (BN, BT, V, lt) output tile accumulated in registers over the
    V source joints (same rationale as _unit_fwd_kernel_tile); the packed
    S*C output never needs the g replica the full-width form concatenated."""

    def write_tile(t0, th, s, l0, w, res):
        dx3_ref[:, t0:t0 + th, :, s * c + l0:s * c + l0 + w] = (
            res.astype(dx3_ref.dtype))

    _dx3_tile_stages(x1_ref, x2_ref, g_ref, w4_ref, b4_ref, alpha_ref[0, 0],
                     A_ref, m_scr, write_tile, c=c, lt=lt, nacc=nacc)


def _unit_bwd_dx3_conv3_kernel_tile(x1_ref, x2_ref, g_ref, w4_ref, b4_ref,
                                    alpha_ref, A_ref, w3t_ref, x_ref,
                                    dx_ref, dw3t_ref, db3_ref,
                                    m_scr, dx3_scr, *, c: int, cin: int,
                                    lt: int = 128, nacc: int = 1):
    """conv3-VJP-fused data gradient (round-5; designed in docs/ROUND4.md
    "Next-round perf candidate").

    The unfused backward writes the packed dx3s (N, T, V, S*C) to HBM
    (51 MB at the deep NW-UCLA shape) and XLA then reads it twice more —
    once for dx = dx3s @ w3^T and once for dW3 = x^T @ dx3s (~170 MB of
    HBM round-trips per layer). This kernel spans conv3's VJP
    (reference models/ctrgcn.py:176 is the aggregation whose producer
    conv3 is): each block's dx3 tiles are accumulated into a VMEM scratch
    exactly as in _unit_bwd_dx3_kernel_tile, then projected through w3^T
    in-kernel — the only HBM outputs are dx (N, T, V, Cin) plus the
    cross-grid-accumulated dW3^T / db3, ~34 MB total.

    w3t (S*C, Cin) is conv3's kernel transposed; x (BN, BT, V, Cin) is the
    conv3 INPUT block (for dW3 = x^T dx3, accumulated as dw3t[sc, cin] so
    both MXU matmuls contract the padded row axis)."""
    BN, S, V, R = x1_ref.shape

    def write_tile(t0, th, s, l0, w, res):
        dx3_scr[:, t0:t0 + th, :, s * c + l0:s * c + l0 + w] = res

    mm_dtype = _dx3_tile_stages(
        x1_ref, x2_ref, g_ref, w4_ref, b4_ref, alpha_ref[0, 0], A_ref,
        m_scr, write_tile, c=c, lt=lt, nacc=nacc,
    )
    BT = g_ref.shape[1]

    # stage 3: conv3 VJP from the VMEM-resident dx3 block. Rows are
    # BN*BT*V (260 at the deep shape) — thin next to XLA's N*T*V-row
    # matmuls, but the entire dx3s HBM round-trip disappears.
    d3 = dx3_scr[:].reshape(BN * BT * V, S * c)
    d3m = d3.astype(mm_dtype)
    dx = jnp.dot(d3m, w3t_ref[:].astype(mm_dtype),
                 preferred_element_type=jnp.float32,
                 precision=_mm_precision(mm_dtype))
    dx_ref[:] = dx.reshape(BN, BT, V, cin).astype(dx_ref.dtype)
    xb = x_ref[:].astype(mm_dtype).reshape(BN * BT * V, cin)
    dw3t_part = jax.lax.dot_general(
        d3m, xb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(mm_dtype),
    )
    db3_part = jnp.sum(d3, axis=0)[None, :]
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    dw3t_ref[:] = jnp.where(first, dw3t_part, dw3t_ref[:] + dw3t_part)
    db3_ref[:] = jnp.where(first, db3_part, db3_ref[:] + db3_part)


def _unit_bwd_dx3_kernel_bcast(x1_ref, x2_ref, g_ref, w4_ref, b4_ref,
                               alpha_ref, A_ref, dx3_ref, *, c: int):
    """Broadcast-form data gradient: dx3_s[t,v,c] = sum_u M_s[u,v,c] g[t,u,c].

    Mirror image of the forward broadcast schedule, iterating over the
    OUTPUT joint u: stage 1 builds M in natural (u, v) layout with one
    sublane broadcast of x1 per u (A needs no transpose/gather), and stage 2
    accumulates `acc[:, t, v, :] += m[u, v] * g[t, u]` — a contiguous m page
    times a 1-sublane splat of g per step, V independent steps, no serial
    roll chain anywhere."""
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    mm_dtype = jnp.bfloat16 if g_ref.dtype == jnp.bfloat16 else jnp.float32
    ms = []
    for s in range(S):
        x1 = x1_ref[:, s].astype(jnp.float32)
        x2 = x2_ref[:, s].astype(jnp.float32)   # (BN, V_v, R)
        ds = []
        for u in range(V):
            ds.append(x1[:, u:u + 1, :] - x2)   # D[u, v]
        dstack = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, u, v, R)
        m = jnp.dot(dstack.reshape(BN * V * V, R).astype(mm_dtype),
                    w4_ref[s].astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                     precision=_mm_precision(mm_dtype)).reshape(BN, V, V, c)
        ms.append((m + b4_ref[s][None]) * alpha
                  + A_ref[s][None, :, :, None])
    mcat = jnp.concatenate(ms, axis=-1)            # (BN, u, v, S*c)
    gc = g_ref[:].astype(jnp.float32)              # (BN, BT, V, C)
    gr = jnp.concatenate([gc] * S, axis=-1)        # (BN, BT, V, S*c)
    acc = mcat[:, 0][:, None] * gr[:, :, 0:1, :]
    for u in range(1, V):
        acc = acc + mcat[:, u][:, None] * gr[:, :, u:u + 1, :]
    dx3_ref[:] = acc.astype(dx3_ref.dtype)


def _unit_bwd_param_kernel_tile(x1_ref, x2_ref, g_ref, x3_ref, w4_ref,
                                b4_ref, alpha_ref,
                                dx1_ref, dx2_ref, dw4_ref, db4_ref, dAt_ref,
                                dalpha_ref, dmt_scr, *, c: int,
                                lt: int = 128):
    """Register-tiled phase B of the broadcast-form parameter gradients.

    The full-width form materialises a (BN, BT, V, S*C) product per source
    joint and reduces it from VMEM; here each (BN, V_u, lt) dm^T tile is
    accumulated over the whole T-block in registers (one 3-vreg FMA per
    frame) and touches the dmt scratch once per (v, s, tile). Phase C is the
    unchanged broadcast-form epilogue (same math, same accumulation across
    sample blocks)."""
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    BT = g_ref.shape[1]
    j = pl.program_id(1)
    first = j == 0

    # ---- phase B (tiled): dm^T[v, u, sc] += sum_t x3[t, v, sc] g[t, u, c]
    # Two loop orders, selected by TAMGCN_PARAM_PHASEB:
    #   v_outer (round 3): one register accumulator per (v, s, tile), t
    #     innermost — the g page is re-read from VMEM V times per (s, tile);
    #   t_outer (round 4 default): V accumulators live at once (V * BN *
    #     ceil(V/8) * w/128 vregs — 60 at BN=1, V=20, w=128), t outermost so
    #     each g page is read ONCE per (s, tile): a V-fold cut of the
    #     dominant VMEM read stream. Measured 595 -> ~430 us at the deep
    #     shape (see docs/KERNELS.md round-4 table).
    phase_b = os.environ.get("TAMGCN_PARAM_PHASEB", "t_outer")
    if phase_b == "t_outer":
        for s in range(S):
            for l0 in range(0, c, lt):
                w = min(lt, c - l0)
                accs = [None] * V
                for t in range(BT):
                    gp = g_ref[:, t, :, l0:l0 + w].astype(jnp.float32)
                    for v in range(V):
                        x3v = (x3_ref[:, t, v, s * c + l0:s * c + l0 + w]
                               .astype(jnp.float32)[:, None, :])
                        term = gp * x3v
                        accs[v] = term if accs[v] is None else accs[v] + term
                for v in range(V):
                    sl = (slice(None), v, slice(None),
                          slice(s * c + l0, s * c + l0 + w))
                    dmt_scr[sl] = jnp.where(first, accs[v],
                                            dmt_scr[sl] + accs[v])
    else:
        for v in range(V):
            for s in range(S):
                for l0 in range(0, c, lt):
                    w = min(lt, c - l0)
                    acc = None
                    for t in range(BT):
                        term = (
                            g_ref[:, t, :, l0:l0 + w].astype(jnp.float32)
                            * x3_ref[:, t, v, s * c + l0:s * c + l0 + w]
                            .astype(jnp.float32)[:, None, :]
                        )
                        acc = term if acc is None else acc + term
                    sl = (slice(None), v, slice(None),
                          slice(s * c + l0, s * c + l0 + w))
                    dmt_scr[sl] = jnp.where(first, acc, dmt_scr[sl] + acc)

    # ---- phase C: identical epilogue to the bcast kernel -------------------
    _param_phase_c(x1_ref, x2_ref, w4_ref, b4_ref, alpha, dmt_scr,
                   dx1_ref, dx2_ref, dw4_ref, db4_ref, dAt_ref, dalpha_ref,
                   c=c)


def _param_phase_c(x1_ref, x2_ref, w4_ref, b4_ref, alpha, dmt_scr,
                   dx1_ref, dx2_ref, dw4_ref, db4_ref, dAt_ref, dalpha_ref,
                   *, c: int):
    """Phase C (last T-block): all parameter gradients from the accumulated
    dm^T scratch — two small MXU matmuls per subset, shared outputs
    accumulated across sample blocks. Runs under pl.when(last T-block)."""
    BN, S, V, R = x1_ref.shape
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    first_sample_block = pl.program_id(0) == 0

    @pl.when(j == nt - 1)
    def _param_grads():
        def accum(ref, idx, val):
            # under jax_enable_x64 some reductions weak-promote to f64;
            # the parameter-grad outputs are f32 refs by construction
            val = val.astype(ref.dtype)
            ref[idx] = jnp.where(first_sample_block, val, ref[idx] + val)

        dalpha_local = jnp.zeros((1, 1), jnp.float32)
        for s in range(S):
            dmt_s = dmt_scr[:, :, :, s * c:(s + 1) * c]  # (BN, v, u, c)
            x1 = x1_ref[:, s].astype(jnp.float32)
            x2 = x2_ref[:, s].astype(jnp.float32)
            ds = []
            for v in range(V):
                ds.append(x1 - x2[:, v:v + 1, :])  # D^T[v, u]
            dstack = jnp.tanh(jnp.stack(ds, axis=1))   # (BN, v, u, R)
            d2 = dstack.reshape(BN * V * V, R)
            dmt2 = dmt_s.reshape(BN * V * V, c)
            accum(dAt_ref, s, jnp.sum(dmt_s, axis=(0, 3)))
            accum(db4_ref, s, alpha * jnp.sum(dmt2, axis=0)[None, :])
            accum(dw4_ref, s, alpha * jax.lax.dot_general(
                d2, dmt2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            p = jnp.dot(d2, w4_ref[s],
                        preferred_element_type=jnp.float32) + b4_ref[s]
            dalpha_local = dalpha_local + jnp.sum(dmt2 * p).reshape(1, 1)
            dd_r = jax.lax.dot_general(
                dmt2, w4_ref[s], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpre = (alpha * dd_r * (1.0 - d2 * d2)).reshape(BN, V, V, R)
            dx1_ref[:, s] = jnp.sum(dpre, axis=1).astype(dx1_ref.dtype)
            dx2_ref[:, s] = (-jnp.sum(dpre, axis=2)).astype(dx2_ref.dtype)
        accum(dalpha_ref, (slice(None), slice(None)), dalpha_local)


def _unit_bwd_param_kernel_flat(x1_ref, x2_ref, g_ref, x3_ref, w4_ref,
                                b4_ref, alpha_ref,
                                dx1_ref, dx2_ref, dw4_ref, db4_ref, dAt_ref,
                                dalpha_ref, dmt_scr, d_scr, *, c: int,
                                lt: int = 128):
    """Flat-2D parameter-gradient schedule (round 5, the task-7 attack).

    Phase attribution on the v5e (docs/KERNELS.md "Round 5") put the tile
    form's cost at ~125 us for phase B and ~453 us for phase C — phase C
    is dominated by the padded-sublane relayouts its (BN, V, V, ·) ->
    (BN*V*V, ·) reshapes force on every one of the N/bn invocations, not
    by matmul throughput. This schedule stores dm^T and D as FLAT
    (V*V, lanes) scratches from the start — 400 rows at V=20 is exactly 50
    aligned sublane tiles — so phase C's matmuls consume them with no
    reshape anywhere, and the dx1/dx2 per-joint reductions become two tiny
    selection-matrix MXU matmuls (built from iota; HIGHEST precision so
    the 400-term sums keep f32-grade accuracy). BN=1 only (the production
    block size at every backbone shape); the wrapper falls back to the
    tile form otherwise. Measured standalone: 596 -> 455 us at the deep
    shape (1.31x); adoption gated on the in-context A/B
    (TAMGCN_PARAM_SCHED ∈ {flat, tile})."""
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    BT = g_ref.shape[1]
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    first = j == 0
    first_sample_block = pl.program_id(0) == 0

    # ---- phase B: dmt rows (v*V + u) accumulated in the flat scratch ----
    for s in range(S):
        for l0 in range(0, c, lt):
            w = min(lt, c - l0)
            accs = [None] * V
            for t in range(BT):
                gp = g_ref[0, t, :, l0:l0 + w].astype(jnp.float32)  # (V_u, w)
                for v in range(V):
                    x3v = (x3_ref[0, t, v, s * c + l0:s * c + l0 + w]
                           .astype(jnp.float32)[None, :])
                    term = gp * x3v
                    accs[v] = term if accs[v] is None else accs[v] + term
            for v in range(V):
                sl = (slice(v * V, v * V + V),
                      slice(s * c + l0, s * c + l0 + w))
                dmt_scr[sl] = jnp.where(first, accs[v], dmt_scr[sl] + accs[v])

    # ---- phase C (last T-block): parameter grads from the flat scratches
    @pl.when(j == nt - 1)
    def _param_grads():
        def accum(ref, idx, val):
            val = val.astype(ref.dtype)
            ref[idx] = jnp.where(first_sample_block, val, ref[idx] + val)

        # selection matrices for the dx1/dx2 row reductions:
        # sel_u[(v,u), u'] = [u == u'];  sel_v[(v,u), v'] = [v == v']
        rows = jax.lax.broadcasted_iota(jnp.int32, (V * V, V), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (V * V, V), 1)
        sel_u = (rows % V == cols).astype(jnp.float32)
        sel_v = (rows // V == cols).astype(jnp.float32)

        dalpha_local = jnp.zeros((1, 1), jnp.float32)
        for s in range(S):
            x1 = x1_ref[0, s].astype(jnp.float32)
            x2 = x2_ref[0, s].astype(jnp.float32)
            for v in range(V):
                d_scr[v * V:v * V + V, :] = jnp.tanh(x1 - x2[v:v + 1, :])
            d2 = d_scr[:]                              # (V*V, R), no reshape
            dmt2 = dmt_scr[:, s * c:(s + 1) * c]       # (V*V, c), lane slice
            accum(dAt_ref, s, jnp.sum(dmt2, axis=1).reshape(V, V))
            accum(db4_ref, s, alpha * jnp.sum(dmt2, axis=0)[None, :])
            accum(dw4_ref, s, alpha * jax.lax.dot_general(
                d2, dmt2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            p = jnp.dot(d2, w4_ref[s],
                        preferred_element_type=jnp.float32) + b4_ref[s]
            dalpha_local = dalpha_local + jnp.sum(dmt2 * p).reshape(1, 1)
            dd_r = jax.lax.dot_general(
                dmt2, w4_ref[s], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpre = alpha * dd_r * (1.0 - d2 * d2)       # (V*V, R)
            dx1_ref[0, s] = jax.lax.dot_general(
                sel_u, dpre, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dx1_ref.dtype)
            dx2_ref[0, s] = (-jax.lax.dot_general(
                sel_v, dpre, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )).astype(dx2_ref.dtype)
        accum(dalpha_ref, (slice(None), slice(None)), dalpha_local)


def _unit_bwd_param_kernel_bcast(x1_ref, x2_ref, g_ref, x3_ref, w4_ref,
                                 b4_ref, alpha_ref,
                                 dx1_ref, dx2_ref, dw4_ref, db4_ref, dAt_ref,
                                 dalpha_ref, dmt_scr, *, c: int):
    """Broadcast-form parameter gradients: same math as
    _unit_bwd_param_kernel, in transposed (v, u) layout with no roll chains.

    Phase B accumulates dm^T[v, u] = sum_t x3[t, v] * g[t, u] — one sublane
    splat of x3 per source joint v, V independent multiply-reduce steps
    (the roll form's V-step serial shuffle chain of x3 disappears). Phase C
    rebuilds D^T[v, u] with the forward's per-v broadcasts, and both
    reductions are now plain axis sums: dx1[u] = sum_v dpre[v, u] (leading
    axis, free) and dx2[v] = -sum_u dpre[v, u] (sublane reduce — the roll
    form needed another V-roll chain here). dAt is emitted transposed and
    swapped back outside."""
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    first_sample_block = pl.program_id(0) == 0

    # ---- phase B: dm^T accumulation over T-blocks --------------------------
    gc = g_ref[:].astype(jnp.float32)
    gr = jnp.concatenate([gc] * S, axis=-1)        # (BN, BT, V_u, S*c)
    x3r = x3_ref[:].astype(jnp.float32)            # (BN, BT, V_v, S*c)
    for v in range(V):
        part = jnp.sum(gr * x3r[:, :, v:v + 1, :], axis=1)  # (BN, u, S*c)

        @pl.when(j == 0)
        def _set(v=v, part=part):
            dmt_scr[:, v] = part

        @pl.when(j != 0)
        def _add(v=v, part=part):
            dmt_scr[:, v] += part

    # ---- phase C (last T-block): parameter grads from dm^T -----------------
    @pl.when(j == nt - 1)
    def _param_grads():
        def accum(ref, idx, val):
            # under jax_enable_x64 some reductions weak-promote to f64;
            # the parameter-grad outputs are f32 refs by construction
            val = val.astype(ref.dtype)
            ref[idx] = jnp.where(first_sample_block, val, ref[idx] + val)

        dalpha_local = jnp.zeros((1, 1), jnp.float32)
        for s in range(S):
            dmt_s = dmt_scr[:, :, :, s * c:(s + 1) * c]  # (BN, v, u, c)
            x1 = x1_ref[:, s].astype(jnp.float32)
            x2 = x2_ref[:, s].astype(jnp.float32)
            ds = []
            for v in range(V):
                ds.append(x1 - x2[:, v:v + 1, :])  # D^T[v, u]
            dstack = jnp.tanh(jnp.stack(ds, axis=1))   # (BN, v, u, R)
            d2 = dstack.reshape(BN * V * V, R)
            dmt2 = dmt_s.reshape(BN * V * V, c)
            accum(dAt_ref, s, jnp.sum(dmt_s, axis=(0, 3)))
            accum(db4_ref, s, alpha * jnp.sum(dmt2, axis=0)[None, :])
            accum(dw4_ref, s, alpha * jax.lax.dot_general(
                d2, dmt2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            p = jnp.dot(d2, w4_ref[s],
                        preferred_element_type=jnp.float32) + b4_ref[s]
            dalpha_local = dalpha_local + jnp.sum(dmt2 * p).reshape(1, 1)
            dd_r = jax.lax.dot_general(
                dmt2, w4_ref[s], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpre = (alpha * dd_r * (1.0 - d2 * d2)).reshape(BN, V, V, R)
            dx1_ref[:, s] = jnp.sum(dpre, axis=1).astype(dx1_ref.dtype)
            dx2_ref[:, s] = (-jnp.sum(dpre, axis=2)).astype(dx2_ref.dtype)
        accum(dalpha_ref, (slice(None), slice(None)), dalpha_local)


def _unit_bwd_dx3_kernel(x1_ref, x2_ref, g_ref, w4_ref, b4_ref, alpha_ref,
                         Atd_ref, dx3_ref, *, c: int):
    """Backward data gradient: dx3_s[t,v,c] = sum_u M_s[u,v,c] g[t,u,c].

    Same roll-diagonal structure as the forward, transposed: mtd[d,v] =
    M[(v+d)%V, v] is built by rolling x1 against a fixed x2, and the packed
    (S*c-wide) g replica rolls once per offset. Atd is the pre-gathered
    transposed diagonal Atd[s,d,v] = A[s,(v+d)%V,v].
    """
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    # bf16 cotangents -> MXU-native bf16 stage-1 matmul, f32 accumulation
    mm_dtype = jnp.bfloat16 if g_ref.dtype == jnp.bfloat16 else jnp.float32
    mtds = []
    for s in range(S):
        x1r = x1_ref[:, s].astype(jnp.float32)
        x2 = x2_ref[:, s].astype(jnp.float32)
        ds = []
        for dd in range(V):
            ds.append(x1r - x2)  # at offset dd: x1[(v+dd) % V]
            if dd + 1 < V:
                x1r = pltpu.roll(x1r, V - 1, axis=1)
        dstackT = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, d, v, R)
        mtd = jnp.dot(dstackT.reshape(BN * V * V, R).astype(mm_dtype),
                      w4_ref[s].astype(mm_dtype),
                      preferred_element_type=jnp.float32,
                     precision=_mm_precision(mm_dtype)).reshape(BN, V, V, c)
        mtds.append((mtd + b4_ref[s][None]) * alpha
                    + Atd_ref[s][None, :, :, None])
    mtdcat = jnp.concatenate(mtds, axis=-1)        # (BN, d, v, S*c)
    gc = g_ref[:].astype(jnp.float32)              # (BN, BT, V, C)
    gr = jnp.concatenate([gc] * S, axis=-1)        # (BN, BT, V, S*c)
    acc = mtdcat[:, 0][:, None] * gr
    for dd in range(1, V):
        gr = pltpu.roll(gr, V - 1, axis=2)
        acc = acc + mtdcat[:, dd][:, None] * gr
    dx3_ref[:] = acc.astype(dx3_ref.dtype)


def _unit_bwd_param_kernel(x1_ref, x2_ref, g_ref, x3_ref, w4_ref, b4_ref,
                           alpha_ref,
                           dx1_ref, dx2_ref, dw4_ref, db4_ref, dAd_ref,
                           dalpha_ref, dmd_scr, *, c: int):
    """Backward parameter gradients, fused: nothing V²xC-sized leaves VMEM.

    The (N, S, V, V, C) dm tensor the unfused backward materialised to HBM
    (78 MB at N=64, C=256) lives here only as the `dmd_scr` scratch
    accumulator (diagonal layout, one sample block wide), and the parameter
    gradients that XLA previously computed from it via layout-hostile
    einsums become two small MXU matmuls per subset.

    Grid: (sample blocks, T blocks), T innermost. Each (i, j) program
    accumulates dmd partial sums for its T-block (phase B); the last T-block
    of each sample block runs phase C (parameter grads + dx1/dx2),
    accumulating the shared parameter outputs across sample blocks.

    Math (per subset s, per sample; diagonal layout d = (v - u) mod V):
      dmd[d,u]   = sum_t g[t,u] * x3[t,(u+d)%V]       (forward diag rolls)
      dA[u,v]    = sum_{n,c} dm  -> accumulated as dAd[d,u], scattered outside
      db4        = alpha * sum_{n,d,u} dmd
      dw4[r,c]   = alpha * sum_{n,d,u} D[.,r] dmd[.,c]        (MXU, lhs.T)
      dalpha     = sum dmd * (D @ w4 + b4)
      dpre       = alpha * (dmd @ w4.T) * (1 - D**2)
      dx1[u]     = sum_d dpre[d,u];  dx2[v] = -sum_d roll(dpre[d], d)
    """
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    first_sample_block = pl.program_id(0) == 0

    # ---- phase B: dmd accumulation over T-blocks (forward-diag layout) ----
    gc = g_ref[:].astype(jnp.float32)
    gr = jnp.concatenate([gc] * S, axis=-1)
    x3r = x3_ref[:].astype(jnp.float32)
    for dd in range(V):
        if dd:
            x3r = pltpu.roll(x3r, V - 1, axis=2)
        part = jnp.sum(gr * x3r, axis=1)  # (BN, u, S*c)

        @pl.when(j == 0)
        def _set(dd=dd, part=part):
            dmd_scr[:, dd] = part

        @pl.when(j != 0)
        def _add(dd=dd, part=part):
            dmd_scr[:, dd] += part

    # ---- phase C (last T-block): parameter grads + dx1/dx2 from dmd -------
    @pl.when(j == nt - 1)
    def _param_grads():
        def accum(ref, idx, val):
            # under jax_enable_x64 some reductions weak-promote to f64;
            # the parameter-grad outputs are f32 refs by construction
            val = val.astype(ref.dtype)
            ref[idx] = jnp.where(first_sample_block, val, ref[idx] + val)

        dalpha_local = jnp.zeros((1, 1), jnp.float32)
        for s in range(S):
            dmd_s = dmd_scr[:, :, :, s * c:(s + 1) * c]  # (BN, d, u, c)
            x2r = x2_ref[:, s].astype(jnp.float32)
            x1 = x1_ref[:, s].astype(jnp.float32)
            ds = []
            for dd in range(V):
                ds.append(x1 - x2r)  # forward diag: x2[(u+dd) % V]
                if dd + 1 < V:
                    x2r = pltpu.roll(x2r, V - 1, axis=1)
            dstack = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, d, u, R)
            d2 = dstack.reshape(BN * V * V, R)
            dmd2 = dmd_s.reshape(BN * V * V, c)
            accum(dAd_ref, s, jnp.sum(dmd_s, axis=(0, 3)))
            accum(db4_ref, s, alpha * jnp.sum(dmd2, axis=0)[None, :])
            # dw4 = alpha * D^T @ dmd (contract the BN*V*V rows on the MXU)
            accum(dw4_ref, s, alpha * jax.lax.dot_general(
                d2, dmd2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            p = jnp.dot(d2, w4_ref[s],
                        preferred_element_type=jnp.float32) + b4_ref[s]
            dalpha_local = dalpha_local + jnp.sum(dmd2 * p).reshape(1, 1)
            # dpre = alpha * (dmd @ w4^T) * (1 - D^2)
            dd_r = jax.lax.dot_general(
                dmd2, w4_ref[s], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dpre = (alpha * dd_r * (1.0 - d2 * d2)).reshape(BN, V, V, R)
            dx1_ref[:, s] = jnp.sum(dpre, axis=1).astype(dx1_ref.dtype)
            acc2 = dpre[:, 0]
            for dd in range(1, V):
                # contribution of offset dd lands on joint v = (u + dd) % V
                acc2 = acc2 + pltpu.roll(dpre[:, dd], dd, axis=1)
            dx2_ref[:, s] = (-acc2).astype(dx2_ref.dtype)
        accum(dalpha_ref, (slice(None), slice(None)), dalpha_local)


# Empirical scoped-VMEM caps on the PADDED per-sample x3 block bytes
# (bt * sublane-padded-V * lane-padded-S*C * 4). Calibrated on the v5e
# (16 MB scoped VMEM) against Mosaic's actual stack accounting (a
# first-principles byte model underestimates the roll-chain buffers ~2x):
# at V=20 (24 sublanes) the (T=52, S*C=192->256 lanes) = 1.28 MB block
# compiles for the forward, while (T=52, S*C=384 lanes) = 1.92 MB overflows
# (17.4 MB > 16 MB). The backward param kernel additionally holds the g
# block and the dmd scratch, so its cap is lower.
#
# Other generations scale the cap by their VMEM size relative to the v5e
# baseline (_vmem_scale); TAMGCN_VMEM_SCALE overrides for recalibration
# without a code change (the caps are conservative-by-construction: an
# undersized cap only shrinks the T-block, it never overflows).
_FWD_BLOCK_BYTES_CAP = 53248 * 24
_BWD_BLOCK_BYTES_CAP = 40960 * 24
# TAMGCN_BWD_BN envelope: accounted (dmd scratch + pipeline blocks) bytes a
# forced sample block may claim (see _unit_bwd_blocks)
_BWD_FORCE_TOTAL_CAP = 6 << 20

# scoped-VMEM MB per generation relative to the v5e's 16 MB
_VMEM_SCALE_BY_KIND = (
    ("v6", 2.0),  # Trillium: 32 MB scoped VMEM
    ("v5p", 1.0),
    ("v5", 1.0),
    ("v4", 1.0),
)


def _vmem_scale() -> float:
    env = os.environ.get("TAMGCN_VMEM_SCALE")
    if env:
        return float(env)
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 1.0
    for key, scale in _VMEM_SCALE_BY_KIND:
        if key in kind:
            return scale
    return 1.0


def _padded_sample_row_bytes(v: int, c: int, s: int) -> int:
    """f32 bytes of one packed (joint, channel) frame, tile-padded."""
    lanes = -(-(s * c) // 128) * 128
    vp = -(-v // 8) * 8
    return vp * lanes * 4


def _pick_blocks(n: int, t: int, cap_bytes: int, row_bytes: int
                 ) -> tuple[int, int]:
    """Largest divisor-of-T block (then sample block) with
    bn * bt * row_bytes <= cap_bytes."""
    bt = 1
    for cand in sorted(
        (d for d in range(1, t + 1) if t % d == 0), reverse=True
    ):
        if cand * row_bytes <= cap_bytes:
            bt = cand
            break
    bn = 1
    while (bn * 2 <= n and n % (bn * 2) == 0
           and bn * 2 * bt * row_bytes <= cap_bytes):
        bn *= 2
    return bn, bt


def _unit_block_n(n: int, t: int, v: int, c: int, s: int) -> tuple[int, int]:
    """(samples per program, T-block) for the forward grid."""
    return _pick_blocks(
        n, t, int(_FWD_BLOCK_BYTES_CAP * _vmem_scale()),
        _padded_sample_row_bytes(v, c, s)
    )


def _unit_bwd_blocks(n: int, t: int, v: int, c: int, s: int) -> tuple[int, int]:
    """(samples per program, T-block) for the backward grid. BT must divide
    T exactly (a padded tail block would feed garbage frames into the dmd
    accumulation) — _pick_blocks only returns divisors.

    TAMGCN_BWD_BN forces the sample-block size (measurement knob: at nt=1
    the param kernel runs its phase-C epilogue once per sample block, so a
    larger bn batches the small per-block MXU matmuls — VMEM permitting)."""
    cap = int(_BWD_BLOCK_BYTES_CAP * _vmem_scale())
    row = _padded_sample_row_bytes(v, c, s)
    bn, bt = _pick_blocks(n, t, cap, row)
    force = os.environ.get("TAMGCN_BWD_BN")
    if force:
        bn = max(1, min(int(force), n))
        while n % bn:
            bn -= 1
        # A forced bn scales the pipeline blocks AND the dmd scratch
        # (bn, V, V, S*C) — v*row bytes per sample next to the bt*row block
        # bytes. Clamp bn (then bt) so the accounted total stays in the
        # known-compiling envelope: bn=2/bt=13 compiles at the deep NW-UCLA
        # shape (4.9 MB accounted), bn=4 and bn=16/bt=1 overflow Mosaic's
        # 16 MB scoped-VMEM stack.
        total_cap = int(_BWD_FORCE_TOTAL_CAP * _vmem_scale())
        while bn > 1 and bn * row * (v + bt) > total_cap:
            bn -= 1
            while n % bn:
                bn -= 1
        while bt > 1 and bn * row * (v + bt) > total_cap:
            bt = max(d for d in range(1, bt) if t % d == 0)
    return bn, bt


# The tile-form kernels hold a (bn, S, V, V, C)-f32 refined-adjacency
# scratch alongside the pipeline blocks. The row-bytes caps above were
# calibrated WITH that scratch present at the production shapes (V<=25,
# C<=256, bn=1), so it is budgeted separately: shrink bn while the scratch
# exceeds the known-compiling envelope, and raise a descriptive error for
# shapes whose bn=1 scratch alone cannot fit (instead of an opaque Mosaic
# scoped-VMEM overflow). Known-good anchor: 1.47 MB at (V=20, C=256).
_TILE_SCRATCH_BYTES_CAP = 4 << 20


def _tile_scratch_bytes(bn: int, s: int, v: int, c: int) -> int:
    vp = -(-v // 8) * 8
    cp = -(-c // 128) * 128
    return bn * s * v * vp * cp * 4


def _fit_tile_scratch(bn: int, s: int, v: int, c: int) -> int:
    cap = int(_TILE_SCRATCH_BYTES_CAP * _vmem_scale())
    while bn > 1 and _tile_scratch_bytes(bn, s, v, c) > cap:
        bn //= 2
    if _tile_scratch_bytes(bn, s, v, c) > cap:
        raise ValueError(
            f"ctr_gc tile-form scratch (S={s}, V={v}, C={c}) needs "
            f"{_tile_scratch_bytes(1, s, v, c)} B of scoped VMEM — over the "
            f"{cap} B envelope on this generation. Use "
            "TAMGCN_CTR_GC_FORM=bcast (no scratch) for this shape, or raise "
            "TAMGCN_VMEM_SCALE on a larger-VMEM part."
        )
    return bn


def _gather_diag(As, transpose: bool):
    """Ad[s,d,u] = A[s,u,(u+d)%V] (fwd) or Atd[s,d,v] = A[s,(v+d)%V,v]."""
    V = As.shape[-1]
    u = jnp.arange(V)[None, :]
    d = jnp.arange(V)[:, None]
    if transpose:
        return As[:, (u + d) % V, u]
    return As[:, u, (u + d) % V]


def unit_ctr_gc_fwd_pallas(x1s, x2s, x3s, w4s, b4s, alpha, As,
                           form: str | None = None):
    """Forward kernel call. x1s/x2s (N,S,V,R); x3s (N,T,V,S*C); w4s (S,R,C);
    b4s (S,C); alpha (1,); As (S,V,V) -> out (N,T,V,C).

    form: 'tile' (default; register-tiled broadcast schedule), 'bcast'
    (full-width broadcast) or 'roll' (roll-diagonal) — same numerics,
    different VPU data movement; TAMGCN_CTR_GC_FORM overrides for
    benchmarking."""
    N, S, V, R = x1s.shape
    T = x3s.shape[1]
    C = x3s.shape[-1] // S
    form = form or os.environ.get("TAMGCN_CTR_GC_FORM") or _default_form(S * C)
    bn, bt = _unit_block_n(N, T, V, C, S)
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    scratch = []
    if form == "tile":
        kernel = functools.partial(_unit_fwd_kernel_tile, c=C)
        Ad = jnp.swapaxes(As, -1, -2)  # At[s, v, u] = A[s, u, v]
        bn = _fit_tile_scratch(bn, S, V, C)
        scratch = [pltpu.VMEM((bn, S, V, V, C), jnp.float32)]
    elif form == "bcast":
        kernel = functools.partial(_unit_fwd_kernel_bcast, c=C)
        Ad = jnp.swapaxes(As, -1, -2)  # At[s, v, u] = A[s, u, v]
    else:
        kernel = functools.partial(_unit_fwd_kernel, c=C)
        Ad = _gather_diag(As, transpose=False)
    return pl.pallas_call(
        kernel,
        grid=(N // bn, T // bt),
        in_specs=[
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bt, V, S * C), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R, C), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, C), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, V, V), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, bt, V, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, C), x3s.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * S * (V * V * R * C + T * V * V * C),
            bytes_accessed=4 * N * (T * V * (S + 1) * C + 2 * S * V * R),
            transcendentals=N * S * V * V * R,
        ),
        interpret=_interpret_default(),
    )(x1s, x2s, x3s, w4s, b4s.reshape(S, 1, C), alpha2d, Ad)


def unit_ctr_gc_bwd_pallas(x1s, x2s, g, x3s, w4s, b4s, alpha, As,
                           form: str | None = None):
    """Fully-fused backward kernel call.

    Returns (dx1s, dx2s, dx3s, dw4s, db4s, dalpha, dAs) — the complete
    gradient set of the unit op; the dense (N,S,V,V,C) dm intermediate never
    touches HBM. form: 'bcast' (default; no serial roll chains) or 'roll'
    (the original roll-diagonal schedule), TAMGCN_CTR_GC_FORM overrides —
    dAs comes back from the kernel's transposed/diagonal layout accordingly.
    """
    N, S, V, R = x1s.shape
    T = x3s.shape[1]
    C = x3s.shape[-1] // S
    form = form or os.environ.get("TAMGCN_CTR_GC_FORM") or _default_form(S * C)
    interp = _interpret_default()
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    if form == "tile":
        dx3_kernel = _unit_bwd_dx3_kernel_tile
        param_kernel = _unit_bwd_param_kernel_tile
        Atd = As  # natural (u, v) layout, no gather
    elif form == "bcast":
        dx3_kernel = _unit_bwd_dx3_kernel_bcast
        param_kernel = _unit_bwd_param_kernel_bcast
        Atd = As  # natural (u, v) layout, no gather
    else:
        dx3_kernel = _unit_bwd_dx3_kernel
        param_kernel = _unit_bwd_param_kernel
        Atd = _gather_diag(As, transpose=True)
    b4r = b4s.reshape(S, 1, C)

    # kernel 1: dx3 (same footprint class as the forward kernel)
    bn, bt = _unit_block_n(N, T, V, C, S)
    if form == "tile":
        bn = _fit_tile_scratch(bn, S, V, C)
    dx3_scratch = (
        [pltpu.VMEM((bn, S, V, V, C), jnp.float32)] if form == "tile" else []
    )
    dx3s = pl.pallas_call(
        functools.partial(dx3_kernel, c=C),
        grid=(N // bn, T // bt),
        in_specs=[
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bt, V, C), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R, C), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, C), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, V, V), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, bt, V, S * C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, S * C), x3s.dtype),
        scratch_shapes=dx3_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * S * (T * V * V * C + V * V * R * C),
            bytes_accessed=4 * N * (T * V * (S + 1) * C + 2 * S * V * R),
            transcendentals=N * S * V * V * R,
        ),
        interpret=interp,
    )(x1s, x2s, g, w4s, b4r, alpha2d, Atd)

    dx1s, dx2s, dw4s, db4s, dalpha, dAs = _unit_param_grads(
        x1s, x2s, g, x3s, w4s, b4s, alpha, As, form=form, interp=interp
    )
    # cotangent dtypes must match the primals (bf16 under mixed precision)
    return dx1s, dx2s, dx3s, dw4s, db4s, dalpha, dAs


def _unit_param_grads(x1s, x2s, g, x3s, w4s, b4s, alpha, As, *, form, interp):
    """Parameter-gradient kernel call (dm accumulation + all parameter
    gradients), shared by the unfused and conv3-fused backward wrappers.
    Returns (dx1s, dx2s, dw4s, db4s, dalpha, dAs) in primal dtypes."""
    N, S, V, R = x1s.shape
    T = x3s.shape[1]
    C = x3s.shape[-1] // S
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    b4r = b4s.reshape(S, 1, C)
    bn, bt = _unit_bwd_blocks(N, T, V, C, S)
    scratch = [pltpu.VMEM((bn, V, V, S * C), jnp.float32)]
    if form == "tile":
        param_kernel = _unit_bwd_param_kernel_tile
        # flat-2D schedule (round 5): relayout-free phase C, BN=1 only;
        # TAMGCN_PARAM_SCHED=tile restores the round-4 schedule for A/B
        if bn == 1 and os.environ.get("TAMGCN_PARAM_SCHED", "flat") == "flat":
            param_kernel = _unit_bwd_param_kernel_flat
            scratch = [
                pltpu.VMEM((V * V, S * C), jnp.float32),
                pltpu.VMEM((V * V, R), jnp.float32),
            ]
    elif form == "bcast":
        param_kernel = _unit_bwd_param_kernel_bcast
    else:
        param_kernel = _unit_bwd_param_kernel
    dx1s, dx2s, dw4s, db4s2, dAd, dalpha2 = pl.pallas_call(
        functools.partial(param_kernel, c=C),
        grid=(N // bn, T // bt),
        in_specs=[
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bt, V, C), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bt, V, S * C), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R, C), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, C), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R, C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, V, V), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, S, V, R), x1s.dtype),
            jax.ShapeDtypeStruct((N, S, V, R), x2s.dtype),
            jax.ShapeDtypeStruct((S, R, C), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((S, V, V), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * S * (T * V * V * C) + 6 * N * S * V * V * R * C,
            bytes_accessed=4 * N * (T * V * (S + 1) * C + 4 * S * V * R),
            transcendentals=N * S * V * V * R,
        ),
        interpret=interp,
    )(x1s, x2s, g, x3s, w4s, b4r, alpha2d)
    if form in ("tile", "bcast"):
        # dAt is in transposed (v, u) layout
        dAs = jnp.swapaxes(dAd, -1, -2).astype(As.dtype)
    else:
        # scatter dAd (diagonal layout d,u) back to (u, v = (u+d) % V)
        V_ = As.shape[-1]
        u = jnp.arange(V_)[None, :]
        d = jnp.arange(V_)[:, None]
        dAs = (jnp.zeros_like(dAd).at[:, u, (u + d) % V_].set(dAd)
               .astype(As.dtype))
    dalpha = jnp.reshape(dalpha2, jnp.shape(alpha)).astype(alpha.dtype)
    db4s = db4s2.reshape(S, C).astype(b4s.dtype)
    return dx1s, dx2s, dw4s.astype(w4s.dtype), db4s, dalpha, dAs


def unit_ctr_gc_bwd_conv3_pallas(x1s, x2s, g, x, x3s, w3, b3, w4s, b4s,
                                 alpha, As, form: str | None = None):
    """conv3-VJP-fused backward: the complete gradient set of
    conv3 -> unit CTR-GC, with the packed dx3s (N, T, V, S*C) never
    touching HBM on the tile-form path.

    x is conv3's INPUT (N, T, V, Cin); w3 (Cin, S*C) its 1x1 kernel;
    x3s = x @ w3 + b3 the saved forward activation (still consumed by the
    parameter-gradient kernel). Returns
    (dx, dw3, db3, dx1s, dx2s, dw4s, db4s, dalpha, dAs).

    Non-tile forms (narrow channels, TAMGCN_CTR_GC_FORM overrides) fall
    back to the unfused dx3 kernel + XLA projection — same math, the
    round-3/4 traffic pattern."""
    N, S, V, R = x1s.shape
    T = x3s.shape[1]
    C = x3s.shape[-1] // S
    Cin = x.shape[-1]
    form = form or os.environ.get("TAMGCN_CTR_GC_FORM") or _default_form(S * C)
    interp = _interpret_default()
    if form != "tile":
        dx1s, dx2s, dx3s, dw4s, db4s, dalpha, dAs = unit_ctr_gc_bwd_pallas(
            x1s, x2s, g, x3s, w4s, b4s, alpha, As, form=form
        )
        dx3f = dx3s.astype(jnp.float32)  # f32-accumulated db3 sum
        dx = jnp.einsum("ntvo,io->ntvi", dx3s, w3).astype(x.dtype)
        dw3 = jnp.einsum(
            "ntvi,ntvo->io", x, dx3s, preferred_element_type=jnp.float32
        ).astype(w3.dtype)
        db3 = jnp.sum(dx3f, axis=(0, 1, 2)).astype(b3.dtype)
        return dx, dw3, db3, dx1s, dx2s, dw4s, db4s, dalpha, dAs

    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    b4r = b4s.reshape(S, 1, C)
    w3t = jnp.swapaxes(w3, 0, 1)  # (S*C, Cin)
    bn, bt = _unit_block_n(N, T, V, C, S)
    bn = _fit_tile_scratch(bn, S, V, C)
    # _unit_block_n budgets only the m_scr scratch + x3-class blocks; this
    # kernel additionally holds the dx3_scr (bn, bt, V, S*C) f32 scratch
    # and the g/x/dx pipeline blocks. Clamp bt so the accounted total stays
    # inside the same envelope the forced-knob path uses (the measured
    # deep/mid shapes land at ~3.4 MB accounted and keep their blocks).
    row = _padded_sample_row_bytes(v=V, c=C, s=S)
    row_cin = (-(-V // 8) * 8) * (-(-Cin // 128) * 128) * 4
    row_c = (-(-V // 8) * 8) * (-(-C // 128) * 128) * 4
    cap = int(_BWD_FORCE_TOTAL_CAP * _vmem_scale())
    while bt > 1 and (
        bn * V * row + bn * bt * (2 * row + row_c + 2 * row_cin) > cap
    ):
        bt = max(d for d in range(1, bt) if T % d == 0)
    dx, dw3t, db3r = pl.pallas_call(
        functools.partial(_unit_bwd_dx3_conv3_kernel_tile, c=C, cin=Cin),
        grid=(N // bn, T // bt),
        in_specs=[
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, V, R), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bt, V, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R, C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S, V, V), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * C, Cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bt, V, Cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, bt, V, Cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * C, Cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S * C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, T, V, Cin), x.dtype),
            jax.ShapeDtypeStruct((S * C, Cin), jnp.float32),
            jax.ShapeDtypeStruct((1, S * C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, S, V, V, C), jnp.float32),
            pltpu.VMEM((bn, bt, V, S * C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * S * (T * V * V * C + V * V * R * C)
            + 4 * N * T * V * S * C * Cin,
            bytes_accessed=4 * N * (T * V * (C + 2 * Cin) + 2 * S * V * R)
            + 8 * S * C * Cin,
            transcendentals=N * S * V * V * R,
        ),
        interpret=interp,
    )(x1s, x2s, g, w4s, b4r, alpha2d, As, w3t, x)

    dx1s, dx2s, dw4s, db4s, dalpha, dAs = _unit_param_grads(
        x1s, x2s, g, x3s, w4s, b4s, alpha, As, form=form, interp=interp
    )
    dw3 = jnp.swapaxes(dw3t, 0, 1).astype(w3.dtype)
    db3 = db3r[0].astype(b3.dtype)
    return dx, dw3, db3, dx1s, dx2s, dw4s, db4s, dalpha, dAs
