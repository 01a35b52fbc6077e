"""Hot-path graph aggregation ops (XLA path).

These are the TPU-native re-designs of the two einsums that dominate the
reference compute:

  * CTR-GC per-channel aggregation `'ncuv,nctv->nctu'`
    (reference models/ctrgcn.py:176) plus its SDDMM-shaped dynamic-topology
    producer `tanh(x1_u - x2_v)` (reference models/ctrgcn.py:174);
  * ST-GCN 3-partition aggregation `'nkctv,kvw->nctw'`
    (reference models/stgcn.py:62).

All activations here are NTVC (batch, time, vertex, channel): channels ride
the 128-wide lane dimension and T rides sublanes, so XLA tiles these as
(8,128) VPU ops / MXU matmuls without transposes. A fused Pallas kernel for
the full CTR-GC block lives in tamgcn_tpu.ops.pallas and is dispatched via
`ctr_gc_fused`; this module is the always-available XLA reference/fallback.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def ctr_gc_dynamic_adjacency(
    x1: jax.Array,  # (N, U, R)   per-joint "source" embedding, T-pooled
    x2: jax.Array,  # (N, V, R)   per-joint "target" embedding, T-pooled
    w4: jax.Array,  # (R, C)      1x1 conv lifting rel-channels to out-channels
    b4: jax.Array | None,  # (C,)
    alpha: jax.Array,  # scalar mixing coefficient
    A: jax.Array,  # (U, V) static partition adjacency
) -> jax.Array:
    """Channel-wise refined adjacency M[n,u,v,c] = (tanh(x1-x2)@w4 + b4)*alpha + A.

    Semantics of reference models/ctrgcn.py:174-175. The pairwise difference is
    the SDDMM-shaped op; the w4 contraction is an MXU matmul over R.
    """
    d = jnp.tanh(x1[:, :, None, :] - x2[:, None, :, :])  # (N, U, V, R)
    m = jnp.einsum(
        "nuvr,rc->nuvc", d, w4,
        preferred_element_type=jnp.promote_types(d.dtype, jnp.float32),
    )
    if b4 is not None:
        m = m + b4
    return m * alpha + A[None, :, :, None]


def ctr_gc_aggregate(m: jax.Array, x3: jax.Array) -> jax.Array:
    """out[n,t,u,c] = sum_v m[n,u,v,c] * x3[n,t,v,c].

    The per-channel V x V batched "SpMM" of reference models/ctrgcn.py:176
    ('ncuv,nctv->nctu'), in NTVC layout.
    """
    return jnp.einsum(
        "nuvc,ntvc->ntuc", m, x3,
        preferred_element_type=jnp.promote_types(x3.dtype, jnp.float32),
    )


def ctr_gc_fused_xla(
    x1: jax.Array,
    x2: jax.Array,
    x3: jax.Array,  # (N, T, V, C)
    w4: jax.Array,
    b4: jax.Array | None,
    alpha: jax.Array,
    A: jax.Array,
) -> jax.Array:
    """Full CTR-GC refine+aggregate, XLA path (oracle for the Pallas kernel)."""
    m = ctr_gc_dynamic_adjacency(x1, x2, w4, b4, alpha, A)
    return ctr_gc_aggregate(m, x3)


def stgcn_aggregate(x: jax.Array, A: jax.Array) -> jax.Array:
    """out[n,t,w,c] = sum_{k,v} x[n,t,v,k,c] * A[k,v,w].

    The 3-partition spatial aggregation of reference models/stgcn.py:62
    ('nkctv,kvw->nctw'), in NTVC layout with the partition axis k packed
    next to channels.
    """
    return jnp.einsum(
        "ntvkc,kvw->ntwc", x, A,
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    )


def unit_ctr_gc_xla(x1s, x2s, x3s, w4s, b4s, alpha, As):
    """XLA fallback for the unit-level fused op: sum of the three per-subset
    CTR-GC branches (reference models/ctrgcn.py:246-254).

    x1s/x2s (N,S,V,R); x3s (N,T,V,S*C); w4s (S,R,C); b4s (S,C); As (S,V,V).
    """
    S = x1s.shape[1]
    C = x3s.shape[-1] // S
    out = None
    for s in range(S):
        y = ctr_gc_fused_xla(
            x1s[:, s], x2s[:, s], x3s[..., s * C:(s + 1) * C],
            w4s[s], b4s[s], alpha, As[s],
        )
        out = y if out is None else out + y
    return out


@jax.custom_vjp
def _unit_ctr_gc_pallas(x1s, x2s, x3s, w4s, b4s, alpha, As):
    from .pallas.ctr_gc import unit_ctr_gc_fwd_pallas

    return unit_ctr_gc_fwd_pallas(x1s, x2s, x3s, w4s, b4s, alpha, As)


def _unit_fwd(x1s, x2s, x3s, w4s, b4s, alpha, As):
    return _unit_ctr_gc_pallas(x1s, x2s, x3s, w4s, b4s, alpha, As), (
        x1s, x2s, x3s, w4s, b4s, alpha, As
    )


def _unit_bwd(res, g):
    """The entire gradient set comes out of the fully-fused backward kernel
    (pallas/ctr_gc.py:unit_ctr_gc_bwd_pallas): dx3 via transposed-diagonal
    rolls, dm accumulated only in VMEM, the parameter gradients as in-kernel
    MXU matmuls accumulated across the sample grid."""
    from .pallas.ctr_gc import unit_ctr_gc_bwd_pallas

    x1s, x2s, x3s, w4s, b4s, alpha, As = res
    return unit_ctr_gc_bwd_pallas(x1s, x2s, g, x3s, w4s, b4s, alpha, As)


_unit_ctr_gc_pallas.defvjp(_unit_fwd, _unit_bwd)


def _tfold(C: int, T: int) -> int:
    """Time-pair fold factor for narrow channels: lanes must carry >= 128
    real values, so C=64 layers fold pairs of frames into the lane axis
    (C=32 would fold quadruples). 1 = no fold needed/possible."""
    if C >= 128 or 128 % C != 0:
        return 1
    tf = 128 // C
    return tf if T % tf == 0 else 1


def unit_ctr_gc(
    x1s, x2s, x3s, w4s, b4s, alpha, As, *, use_pallas: bool | None = None
):
    """Dispatch the unit-level (3-subset) fused CTR-GC op.

    Pallas on TPU; narrow-channel layers (C < 128) fold `tf = 128 // C`
    consecutive frames into the lane axis so every lane carries a real
    value. XLA fallback elsewhere (CPU tests, odd widths).

    Round-4 measurement note: STANDALONE, the fold/unfold XLA transposes
    cost 1178/241 us each way at (N=64, T=52, S*C=192, v5e) and the
    unfolded broadcast-form kernels (192->256 lane pad) win by ~1.4 ms per
    layer — but IN CONTEXT the fold transposes fuse into the adjacent
    conv3 producer / BN consumer and the folded path wins the end-to-end
    step (38.3 vs 42.5 ms f32, batch 64). TAMGCN_NARROW_DISPATCH
    ∈ {fold, unfold, xla} overrides the narrow-channel choice for
    measurement; the default is fold where the fold is exact and the
    joint axis pads mildly (V <= 20), XLA otherwise (V=25 measured worse
    under both Pallas variants).
    """
    S = x1s.shape[1]
    T = x3s.shape[1]
    C = x3s.shape[-1] // S
    tf = _tfold(C, T)
    mode = os.environ.get("TAMGCN_NARROW_DISPATCH", "fold")
    if use_pallas is None:
        V_ = x1s.shape[2]
        if C >= 128:
            # the fused kernels hold (V, V, C)-class refined-adjacency
            # state in VMEM — a skeleton-scale design (V<=25, padded 32).
            # Large-V graphs (graphs/synthetic.py scene-graph configs) run
            # the XLA lowering single-chip; at pod scale they take the
            # edge-partitioned ring, whose per-step V/k blocks land back
            # inside the kernels' envelope.
            use_pallas = jax.default_backend() == "tpu" and V_ <= 32
        elif mode == "xla":
            use_pallas = False
        elif mode == "unfold":
            use_pallas = jax.default_backend() == "tpu" and C >= 64
        else:
            use_pallas = jax.default_backend() == "tpu" and (
                tf > 1 and V_ <= 20
            )
    if not use_pallas:
        return unit_ctr_gc_xla(x1s, x2s, x3s, w4s, b4s, alpha, As)
    if C >= 128 or tf == 1 or mode == "unfold":
        return _unit_ctr_gc_pallas(x1s, x2s, x3s, w4s, b4s, alpha, As)
    N, _, V, _ = x1s.shape
    # fold: (N,T,V,S,C) -> (N, T/tf, V, S, tf, C) -> lanes [s | parity | c]
    xf = x3s.reshape(N, T // tf, tf, V, S, C)
    xf = jnp.transpose(xf, (0, 1, 3, 4, 2, 5)).reshape(
        N, T // tf, V, S * tf * C
    )
    w4f = jnp.concatenate([w4s] * tf, axis=-1)  # (S, R, tf*C)
    b4f = jnp.concatenate([b4s] * tf, axis=-1)  # (S, tf*C)
    out = _unit_ctr_gc_pallas(x1s, x2s, xf, w4f, b4f, alpha, As)
    # unfold: (N, T/tf, V, tf*C) -> (N, T, V, C)
    out = out.reshape(N, T // tf, V, tf, C)
    return jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(N, T, V, C)


def conv3_matmul(x, w3, b3):
    """The packed conv3 1x1 as a matmul: x (N,T,V,Cin) @ w3 (Cin,S*C) + b3.

    Same math as the flax nn.Conv it replaces on the fused path (reference
    models/ctrgcn.py:162 `self.conv3 = nn.Conv2d(...)`); inputs are expected
    pre-cast to the compute dtype (the caller mirrors nn.Conv's
    promote_dtype)."""
    return jnp.einsum("ntvi,io->ntvo", x, w3) + b3


@jax.custom_vjp
def _unit_ctr_gc_conv3_pallas(x, w3, b3, x1s, x2s, w4s, b4s, alpha, As):
    from .pallas.ctr_gc import unit_ctr_gc_fwd_pallas

    x3s = conv3_matmul(x, w3, b3)
    return unit_ctr_gc_fwd_pallas(x1s, x2s, x3s, w4s, b4s, alpha, As)


def _unit_conv3_fwd(x, w3, b3, x1s, x2s, w4s, b4s, alpha, As):
    from .pallas.ctr_gc import unit_ctr_gc_fwd_pallas

    x3s = conv3_matmul(x, w3, b3)
    out = unit_ctr_gc_fwd_pallas(x1s, x2s, x3s, w4s, b4s, alpha, As)
    return out, (x, w3, b3, x1s, x2s, x3s, w4s, b4s, alpha, As)


def _unit_conv3_bwd(res, g):
    """conv3's VJP fused into the dx3 kernel (pallas/ctr_gc.py:
    unit_ctr_gc_bwd_conv3_pallas): the packed dx3s intermediate stays in
    VMEM; dW3/db3 ride the cross-grid accumulation; the parameter kernel
    is the shared one."""
    from .pallas.ctr_gc import unit_ctr_gc_bwd_conv3_pallas

    x, w3, b3, x1s, x2s, x3s, w4s, b4s, alpha, As = res
    return unit_ctr_gc_bwd_conv3_pallas(
        x1s, x2s, g, x, x3s, w3, b3, w4s, b4s, alpha, As
    )


_unit_ctr_gc_conv3_pallas.defvjp(_unit_conv3_fwd, _unit_conv3_bwd)


def unit_ctr_gc_conv3(
    x, w3, b3, x1s, x2s, w4s, b4s, alpha, As, *, use_pallas: bool | None = None
):
    """conv3 + unit-level fused CTR-GC op: out = unit_ctr_gc(conv3(x)).

    x (N,T,V,Cin); w3 (Cin, S*C); b3 (S*C,); remaining args as unit_ctr_gc.
    Spanning conv3 lets the backward keep the packed dx3s (N,T,V,S*C)
    gradient in VMEM — dx is emitted directly in conv3's input width (17 MB
    instead of 51 MB at the deep NW-UCLA shape) and dW3/db3 accumulate
    across the kernel grid (docs/ROUND4.md "Next-round perf candidate";
    reference anchor models/ctrgcn.py:176).

    MEASURED AND RETIRED (round 5, v5e, batch 64): the fused path loses the
    in-context train step 45.6 vs 37.9 ms. Ablation (docs/KERNELS.md
    "Round 5"): ~5.5 ms is the kernel restructure itself (staging dx3
    through a whole-block VMEM scratch instead of the pipelined out ref,
    plus the extra x/w3t operands), ~1.1 ms the padded-sublane reshape +
    db3 reduce, ~1.1 ms the thin-row MXU projections (bf16 no better) —
    while the entire HBM saving the fusion exists to capture is ~1.1
    ms/step. TAMGCN_FUSE_CONV3=1 re-enables it for measurement; the
    default everywhere is the unfused path (conv3_matmul + unit_ctr_gc,
    measured equal to the round-4 baseline)."""
    S = x1s.shape[1]
    C = w3.shape[-1] // S
    V_ = x1s.shape[2]
    fuse = os.environ.get("TAMGCN_FUSE_CONV3", "0") == "1"
    eligible = (
        jax.default_backend() == "tpu" if use_pallas is None else use_pallas
    )
    # same skeleton-scale joint guard as unit_ctr_gc: the kernels' VMEM
    # adjacency state is impossible at scene-graph V
    if eligible and fuse and C >= 128 and S * C >= 384 and V_ <= 32:
        return _unit_ctr_gc_conv3_pallas(
            x, w3, b3, x1s, x2s, w4s, b4s, alpha, As
        )
    x3s = conv3_matmul(x, w3, b3)
    return unit_ctr_gc(
        x1s, x2s, x3s, w4s, b4s, alpha, As, use_pallas=use_pallas
    )


def ctr_gc_fused(
    x1: jax.Array,
    x2: jax.Array,
    x3: jax.Array,
    w4: jax.Array,
    b4: jax.Array | None,
    alpha: jax.Array,
    A: jax.Array,
    *,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Dispatch the fused CTR-GC op: Pallas on TPU, XLA elsewhere.

    use_pallas=None auto-selects by backend platform and shape: the fused
    kernel pays off where the XLA path's (N, V, V, C) dynamic-adjacency
    intermediate dominates HBM traffic (wide channels); at narrow channels
    the lane padding (C=64 -> 128) doubles the kernel's VPU work and XLA's
    fusion wins (serial-chained on v5e: pallas 4.3x at C=256, 1.75x at
    C=128, 0.3x at C=64; end-to-end CTRGCN train step 8.3 ms auto vs
    14.8 ms XLA-only vs 99.5 ms pallas-everywhere, batch 64).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and x3.shape[-1] >= 128
    if use_pallas:
        from .pallas.ctr_gc import ctr_gc_fused_pallas

        return ctr_gc_fused_pallas(x1, x2, x3, w4, b4, alpha, A)
    return ctr_gc_fused_xla(x1, x2, x3, w4, b4, alpha, A)
