"""Fused GCN+TCN block Pallas kernel (inference).

One TCN_GCN_unit of the reference (models/ctrgcn.py:266-284) is
``y = relu(tcn1(gcn1(x)) + residual(x))``. In eval mode every BatchNorm is a
per-channel affine, which makes the whole block — except the dilated
temporal convolutions — a chain of matmuls and elementwise ops that this
kernel runs in a single VMEM pass:

    x3      = x @ W3 + b3                    # packed 3-subset conv3 (MXU)
    y       = ctr_gc_aggregate(x1, x2, x3)   # broadcast-form stage 1+2
    y       = y * s_bn + t_bn                # unit_gcn BN (affine)
    res     = x  |  x @ Wd + bd              # identity / folded down conv+BN
    off     = tanh((res - y) @ Wo + bo)      # TAM offset conv+BN (folded)
    h       = relu(y + off + res)            # unit_gcn output — never in HBM
    prefix  = relu(h @ Wp + bp)              # TCN entry 1x1 conv+BN (folded)
    pw      = h @ Wpw + bpw                  # TCN plain-1x1 branch (+out_bn)

Outputs are ``prefix`` (the input to the dilated/maxpool TCN branches, which
run as XLA convolutions — they need T-halos and the MXU handles them well)
and ``pw``. Everything in between — reference models/ctrgcn.py:196-263
(unit_gcn incl. the TAM offset branch) plus the entry/plain-1x1 stages of
MultiScale_TemporalConv (:93-124) — stays in VMEM: the (N, T, V, C) unit_gcn
output ``h``, its BN/offset/residual intermediates, and the (N, V, V, C)
dynamic adjacency never touch HBM.

Weight folding (done once on the host, `ctrgcn_infer.fold_block`): BN affine
after a 1x1 conv folds into the conv, ``(x @ W + b) * s + t = x @ (W * s) +
(b * s + t)``.

Train mode keeps the unit-level CTR-GC kernels (ctr_gc.py) — batch-stat
BatchNorm needs cross-block reductions that would force this kernel into two
passes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctr_gc import (
    S_SUBSETS,
    _interpret_default,
    _padded_sample_row_bytes,
    _FWD_BLOCK_BYTES_CAP,
    _vmem_scale,
)


def _block_kernel(x_ref, x1_ref, x2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
                  alpha_ref, At_ref, gy_ref, wo_ref, bo_ref, wp_ref, bp_ref,
                  wpw_ref, bpw_ref, *rest, c: int, identity_res: bool):
    """One grid step = (bn samples, bt frames) of one whole GCN+TCN block.

    Refs: x (BN,BT,V,Cin); x1,x2 (BN,S,V,R); w3 (Cin,S*C); b3 (1,S*C);
    w4 (S,R,C); b4 (S,1,C); alpha (1,1) SMEM; At (S,V,V) transposed
    adjacency; gy (2,C) = unit_gcn BN (scale; bias); wo/bo offset conv
    (folded); wp/bp TCN prefix conv (folded); wpw/bpw pw branch (folded);
    rest = ([wd, bd,] prefix_out, pw_out, mt_scr) — wd/bd only when the GCN
    residual is a down conv. The T grid dimension is innermost: the dynamic
    adjacency is built once per sample block (first T-block) into the
    `mt_scr` VMEM scratch and reused across the sample's T-blocks."""
    if identity_res:
        prefix_ref, pw_ref, mt_scr, x3_scr = rest
    else:
        wd_ref, bd_ref, prefix_ref, pw_ref, mt_scr, x3_scr = rest
    alpha = alpha_ref[0, 0]
    BN, S, V, R = x1_ref.shape
    Cin = x_ref.shape[-1]
    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32

    # ---- stage 1 (first T-block only): transposed dynamic adjacency -------
    @pl.when(pl.program_id(1) == 0)
    def _build_mt():
        mts = []
        for s in range(S):
            x1 = x1_ref[:, s].astype(jnp.float32)   # (BN, V_u, R)
            x2 = x2_ref[:, s].astype(jnp.float32)
            ds = []
            for v in range(V):
                ds.append(x1 - x2[:, v:v + 1, :])   # D^T[v, u]
            dstack = jnp.tanh(jnp.stack(ds, axis=1))  # (BN, v, u, R)
            mt = jnp.dot(dstack.reshape(BN * V * V, R).astype(mm),
                         w4_ref[s].astype(mm),
                         preferred_element_type=jnp.float32
                         ).reshape(BN, V, V, c)
            mts.append((mt + b4_ref[s][None]) * alpha
                       + At_ref[s][None, :, :, None])
        mt_scr[:] = jnp.concatenate(mts, axis=-1)   # (BN, v, u, S*c)

    # ---- packed conv3 (x3 never leaves VMEM) ------------------------------
    xr = x_ref[:].astype(jnp.float32)           # (BN, BT, V, Cin)
    BT = xr.shape[1]
    rows = xr.reshape(BN * BT * V, Cin)
    x3 = jnp.dot(rows.astype(mm), w3_ref[:].astype(mm),
                 preferred_element_type=jnp.float32) + b3_ref[0]
    x3_scr[:] = x3.reshape(BN, BT, V, S * c)

    # ---- stage 2: register-tiled aggregation (see ctr_gc.py tile form:
    # each (BN, tc, V, 128) out tile accumulates in registers over all
    # (s, v) terms, with BOTH operands read as ref slices — value slicing
    # makes Mosaic relayout the whole tensor per step) ----------------------
    steps2 = [(sb, v) for sb in range(S) for v in range(V)]
    y_parts = []
    for t0 in range(0, BT, 4):
        th = min(4, BT - t0)
        l_parts = []
        for l0 in range(0, c, 128):
            w = min(128, c - l0)
            acc2 = None
            for sb, v in steps2:
                term = (mt_scr[:, v, :, sb * c + l0:sb * c + l0 + w][:, None]
                        * x3_scr[:, t0:t0 + th, v:v + 1,
                                 sb * c + l0:sb * c + l0 + w])
                acc2 = term if acc2 is None else acc2 + term
            l_parts.append(acc2)
        y_parts.append(l_parts[0] if len(l_parts) == 1
                       else jnp.concatenate(l_parts, axis=-1))
    y = y_parts[0] if len(y_parts) == 1 else jnp.concatenate(y_parts, axis=1)

    # ---- unit_gcn epilogue: BN affine, residual, TAM offset, relu ---------
    y = y * gy_ref[0] + gy_ref[1]
    if identity_res:
        res = xr  # Cin == c
    else:
        res = (jnp.dot(rows.astype(mm), wd_ref[:].astype(mm),
                       preferred_element_type=jnp.float32)
               + bd_ref[0]).reshape(BN, BT, V, c)
    diff = (res - y).reshape(BN * BT * V, c)
    off = jnp.tanh(jnp.dot(diff.astype(mm), wo_ref[:].astype(mm),
                           preferred_element_type=jnp.float32) + bo_ref[0])
    h = jnp.maximum(y + off.reshape(BN, BT, V, c) + res, 0.0)

    # ---- TCN entry: prefix 1x1 conv+BN+relu, plain 1x1 branch -------------
    h2 = h.reshape(BN * BT * V, c)
    prefix = jnp.maximum(
        jnp.dot(h2.astype(mm), wp_ref[:].astype(mm),
                preferred_element_type=jnp.float32) + bp_ref[0], 0.0)
    P = prefix_ref.shape[-1]
    prefix_ref[:] = prefix.reshape(BN, BT, V, P).astype(prefix_ref.dtype)
    pw = jnp.dot(h2.astype(mm), wpw_ref[:].astype(mm),
                 preferred_element_type=jnp.float32) + bpw_ref[0]
    BC = pw_ref.shape[-1]
    pw_ref[:] = pw.reshape(BN, BT, V, BC).astype(pw_ref.dtype)


def _block_row_bytes(v: int, cin: int, c: int, s: int, p: int, bc: int) -> int:
    """Approximate padded f32 bytes of one (joint-page, frame) of live data:
    x + x3 + ~3 C-wide chains (y/res/h) + prefix + pw."""
    return (
        _padded_sample_row_bytes(v, cin, 1)
        + _padded_sample_row_bytes(v, c, s)
        + 3 * _padded_sample_row_bytes(v, c, 1)
        + _padded_sample_row_bytes(v, p, 1)
        + _padded_sample_row_bytes(v, bc, 1)
    )


def _block_fixed_bytes(v: int, c: int, s: int, r: int) -> int:
    """Per-sample bt-independent VMEM: the mtcat scratch plus the stage-1
    D-stack temporaries (V pages of lane-padded R)."""
    return v * _padded_sample_row_bytes(v, c, s) + \
        s * v * _padded_sample_row_bytes(v, r, 1)


def _pick_block_shapes(n: int, t: int, cap: int, row: int, fixed: int
                       ) -> tuple[int, int]:
    """Largest T-block (divisor of t), then largest power-of-2 sample block,
    with bn * (bt * row + fixed) <= cap. The cap is a conservative
    per-block budget (the production C=256 deep blocks exceed it at bt=1
    and still compile), so bt=1 over-cap is allowed — but a minimum block
    several times the budget cannot fit scoped VMEM at all and would die in
    Mosaic with an opaque overflow; raise a descriptive error instead so
    callers can dispatch such V/C configs to the XLA folded-affine path."""
    if row + fixed > 8 * cap:
        raise ValueError(
            f"fused GCN+TCN block does not fit scoped VMEM even at "
            f"(bn=1, bt=1): row={row}B + fixed={fixed}B > cap={cap}B. "
            "This V/C config is too large for the fused kernel on this "
            "generation — use the XLA eval path (fast_eval off or "
            "use_pallas=False), or raise TAMGCN_VMEM_SCALE on a "
            "larger-VMEM chip."
        )
    bt = 1
    for cand in sorted((d for d in range(1, t + 1) if t % d == 0),
                       reverse=True):
        if cand * row + fixed <= cap:
            bt = cand
            break
    bn = 1
    while (bn * 2 <= n and n % (bn * 2) == 0
           and bn * 2 * (bt * row + fixed) <= cap):
        bn *= 2
    return bn, bt


def gcn_tcn_block_fused(
    x, x1s, x2s, w3, b3, w4s, b4s, alpha, As, gy, wo, bo, wp, bp, wpw, bpw,
    wd=None, bd=None,
):
    """Run one fused eval-mode GCN+TCN block. Shapes:

    x (N,T,V,Cin); x1s/x2s (N,S,V,R); w3 (Cin,S*C); b3 (S*C,); w4s (S,R,C);
    b4s (S,C); alpha (1,); As (S,V,V); gy (2,C); wo (C,C); bo (C,);
    wp (C,P); bp (P,); wpw (C,BC); bpw (BC,); wd (Cin,C)/bd (C,) or None
    (identity residual). Returns (prefix (N,T,V,P), pw (N,T,V,BC)).
    """
    N, T, V, Cin = x.shape
    S = x1s.shape[1]
    C = w4s.shape[-1]
    P = wp.shape[-1]
    BC = wpw.shape[-1]
    identity_res = wd is None
    R = x1s.shape[-1]
    cap = int(_FWD_BLOCK_BYTES_CAP * _vmem_scale())
    bn, bt = _pick_block_shapes(
        N, T, cap, _block_row_bytes(V, Cin, C, S, P, BC),
        _block_fixed_bytes(V, C, S, R),
    )
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    At = jnp.swapaxes(As, -1, -2)

    kernel = functools.partial(
        _block_kernel, c=C, identity_res=identity_res
    )
    dt = x.dtype
    f32 = jnp.float32

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    const2 = lambda i, j: (0, 0)
    const3 = lambda i, j: (0, 0, 0)
    in_specs = [
        vspec((bn, bt, V, Cin), lambda i, j: (i, j, 0, 0)),
        vspec((bn, S, V, x1s.shape[-1]), lambda i, j: (i, 0, 0, 0)),
        vspec((bn, S, V, x1s.shape[-1]), lambda i, j: (i, 0, 0, 0)),
        vspec((Cin, S * C), const2),
        vspec((1, S * C), const2),
        vspec((S, x1s.shape[-1], C), const3),
        vspec((S, 1, C), const3),
        pl.BlockSpec((1, 1), const2, memory_space=pltpu.SMEM),
        vspec((S, V, V), const3),
        vspec((2, C), const2),
        vspec((C, C), const2),
        vspec((1, C), const2),
        vspec((C, P), const2),
        vspec((1, P), const2),
        vspec((C, BC), const2),
        vspec((1, BC), const2),
    ]
    args = [
        x, x1s, x2s, w3, b3.reshape(1, S * C), w4s,
        b4s.reshape(S, 1, C), alpha2d, At, gy, wo, bo.reshape(1, C),
        wp, bp.reshape(1, P), wpw, bpw.reshape(1, BC),
    ]
    if not identity_res:
        in_specs += [vspec((Cin, C), const2), vspec((1, C), const2)]
        args += [wd, bd.reshape(1, C)]

    flops_agg = 2 * N * S * (V * V * x1s.shape[-1] * C + T * V * V * C)
    flops_mm = 2 * N * T * V * (
        Cin * S * C + C * C + C * P + C * BC + (0 if identity_res else Cin * C)
    )
    return pl.pallas_call(
        kernel,
        grid=(N // bn, T // bt),
        in_specs=in_specs,
        out_specs=[
            vspec((bn, bt, V, P), lambda i, j: (i, j, 0, 0)),
            vspec((bn, bt, V, BC), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, T, V, P), dt),
            jax.ShapeDtypeStruct((N, T, V, BC), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, V, V, S * C), jnp.float32),
            pltpu.VMEM((bn, bt, V, S * C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_agg + flops_mm,
            bytes_accessed=4 * N * T * V * (Cin + P + BC),
            transcendentals=N * (S * V * V * x1s.shape[-1] + T * V * C),
        ),
        interpret=_interpret_default(),
    )(*args)
