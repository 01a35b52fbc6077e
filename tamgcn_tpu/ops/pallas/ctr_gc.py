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

Layout: channels ride the 128-lane axis; the joint axis V (20/25) is unrolled
— each of the V output joints is one (V, C) matmul on the MXU plus one
(T, V, C) multiply-reduce on the VPU.

Backward is a custom VJP: x3's gradient reuses the same fused kernel with M
transposed in (u, v) (aggregation is linear in x3), and the small parameter
gradients (w4, b4, alpha, A, x1, x2) are XLA einsums over the recomputed D —
they touch V²-sized tensors only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
        interpret=jax.default_backend() != "tpu",
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
# Measured (tunneled v5e, honest chained timing): 593 us vs 3 x 455-511 us
# per-subset at (N=64, T=13, V=20, C=256) — ~2.3x.
#
# The backward kernel additionally fuses the dm = sum_t g*x3 contraction that
# XLA otherwise runs as a layout-hostile einsum materialising (N, V, V, C)
# per subset to HBM (the dominant cost of the unfused backward).
# ---------------------------------------------------------------------------

S_SUBSETS = 3


def _unit_fwd_kernel(x1_ref, x2_ref, x3_ref, w4_ref, b4_ref, alpha_ref, A_ref,
                     out_ref, *, c: int):
    """x1,x2 (BN,S,V,R); x3 (BN,T,V,S*C); w4 (S,R,C); b4 (S,1,C); A (S,V,V);
    out (BN,T,V,C) = sum_s sum_v m_s[u,v,c] * x3_s[t,v,c]."""
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    ms = []
    for s in range(S):
        # bf16-safe: inputs may be bf16, all arithmetic runs f32 in VMEM
        x1 = x1_ref[:, s].astype(jnp.float32)
        x2 = x2_ref[:, s].astype(jnp.float32)
        # m[u, v]: output joint u on an outer dim (stage 2 indexes it), input
        # joint v on sublanes (aligned with x3's joint axis)
        d = jnp.tanh(x1[:, :, None, :] - x2[:, None, :, :])  # (BN, u, v, R)
        m = jnp.dot(d.reshape(BN * V * V, R), w4_ref[s],
                    preferred_element_type=jnp.float32).reshape(BN, V, V, c)
        ms.append((m + b4_ref[s][None]) * alpha + A_ref[s][None, :, :, None])
    x3 = x3_ref[:].astype(jnp.float32)
    for u in range(V):
        acc = None
        for s in range(S):
            x3_s = x3[:, :, :, s * c:(s + 1) * c]
            term = jnp.sum(ms[s][:, u, :, :][:, None, :, :] * x3_s,
                           axis=2, keepdims=True)
            acc = term if acc is None else acc + term
        out_ref[:, :, u:u + 1, :] = acc.astype(out_ref.dtype)


def _unit_bwd_kernel(x1_ref, x2_ref, g_ref, x3_ref, w4_ref, b4_ref, alpha_ref,
                     A_ref, dx3_ref, dm_ref, *, c: int):
    """Fused backward data path.

    dx3_s[t,v,c] = sum_u m_s[u,v,c] * g[t,u,c]   (aggregation is linear in x3)
    dm_s[u,v,c]  = sum_t g[t,u,c] * x3_s[t,v,c]

    in: x1,x2 (BN,S,V,R); g (BN,T,V,C); x3 (BN,T,V,S*C); w4 (S,R,C);
        b4 (S,1,C); alpha SMEM; A (S,V,V)
    out: dx3 (BN,T,V,S*C); dm (BN,S,V,V,C)  [dm[u,v] indexed (out, in)]
    """
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    T = g_ref.shape[1]
    g = g_ref[:].astype(jnp.float32)
    for s in range(S):
        x1 = x1_ref[:, s].astype(jnp.float32)
        x2 = x2_ref[:, s].astype(jnp.float32)
        # mT[v, u] = M[u, v]: stage-2 indexes input joint v on an outer dim
        dT = jnp.tanh(x1[:, None, :, :] - x2[:, :, None, :])  # (BN, v, u, R)
        mT = jnp.dot(dT.reshape(BN * V * V, R), w4_ref[s],
                     preferred_element_type=jnp.float32).reshape(BN, V, V, c)
        mT = (mT + b4_ref[s][None]) * alpha + A_ref[s].T[None, :, :, None]
        for v in range(V):
            acc = jnp.sum(mT[:, v, :, :][:, None, :, :] * g,
                          axis=2, keepdims=True)
            dx3_ref[:, :, v:v + 1, s * c:(s + 1) * c] = acc.astype(dx3_ref.dtype)
    # dm: contraction over t (an outer dim for both g and x3)
    for s in range(S):
        x3_s = x3_ref[:, :, :, s * c:(s + 1) * c].astype(jnp.float32)
        for u in range(V):
            acc = None
            for t in range(T):
                term = g[:, t, u:u + 1, :] * x3_s[:, t]
                acc = term if acc is None else acc + term
            dm_ref[:, s, u, :, :] = acc


def _unit_block_n(n: int, t: int, v: int, c: int, s: int, bwd: bool) -> int:
    """Samples per program targeting ~2.5 MB of padded VMEM blocks."""
    vp = -(-v // 8) * 8
    cp = -(-c // 128) * 128
    per = (t * vp * s * cp + t * vp * cp + s * v * vp * cp) * 4
    if bwd:
        per += (t * vp * s * cp + s * v * vp * cp) * 4
    target = max(1, (5 << 20) // max(per, 1))
    bn = 1
    while bn * 2 <= min(target, n) and n % (bn * 2) == 0:
        bn *= 2
    return bn


def unit_ctr_gc_fwd_pallas(x1s, x2s, x3s, w4s, b4s, alpha, As):
    """Forward kernel call. x1s/x2s (N,S,V,R); x3s (N,T,V,S*C); w4s (S,R,C);
    b4s (S,C); alpha (1,); As (S,V,V) -> out (N,T,V,C)."""
    N, S, V, R = x1s.shape
    T = x3s.shape[1]
    C = x3s.shape[-1] // S
    bn = _unit_block_n(N, T, V, C, S, bwd=False)
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    return pl.pallas_call(
        functools.partial(_unit_fwd_kernel, c=C),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, S, V, R), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, V, R), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, T, V, S * C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, V, V), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, T, V, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, C), x3s.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * S * (V * V * R * C + T * V * V * C),
            bytes_accessed=4 * N * (T * V * (S + 1) * C + 2 * S * V * R),
            transcendentals=N * S * V * V * R,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x1s, x2s, x3s, w4s, b4s.reshape(S, 1, C), alpha2d, As)


def unit_ctr_gc_bwd_pallas(x1s, x2s, g, x3s, w4s, b4s, alpha, As):
    """Backward kernel call -> (dx3s (N,T,V,S*C), dm (N,S,V,V,C))."""
    N, S, V, R = x1s.shape
    T = x3s.shape[1]
    C = x3s.shape[-1] // S
    bn = _unit_block_n(N, T, V, C, S, bwd=True)
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    return pl.pallas_call(
        functools.partial(_unit_bwd_kernel, c=C),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, S, V, R), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, V, R), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, T, V, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, T, V, S * C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, V, V), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, T, V, S * C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, S, V, V, C), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, T, V, S * C), x3s.dtype),
            jax.ShapeDtypeStruct((N, S, V, V, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * S * (T * V * V * C) + 2 * N * S * V * V * R * C,
            bytes_accessed=4 * N * (2 * T * V * (S + 1) * C + S * V * V * C),
            transcendentals=N * S * V * V * R,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x1s, x2s, g, x3s, w4s, b4s.reshape(S, 1, C), alpha2d, As)
