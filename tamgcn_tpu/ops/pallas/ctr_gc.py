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
