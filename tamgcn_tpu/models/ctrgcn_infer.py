"""Fast CTR-GCN inference engine: fused GCN+TCN blocks.

Builds, from a trained `CTRGCN` model's variables, a jitted eval forward that
is numerically equivalent to ``model.apply(variables, x, train=False)`` but
runs each of the 10 TCN_GCN_unit blocks (reference models/ctrgcn.py:266-284)
through the fused Pallas block kernel
(`tamgcn_tpu.ops.pallas.gcn_tcn_block`): every eval BatchNorm folds into the
adjacent 1x1 conv on the host, and the unit_gcn output plus all its
epilogue intermediates stay in VMEM. Only the dilated/maxpool temporal
branches (true convolutions needing T-halos) and the tiny pooled head run as
XLA ops.

Used by the test-phase/ensemble inference paths; training keeps the flax
module (batch-stat BatchNorm needs cross-block reductions).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.pallas.gcn_tcn_block import gcn_tcn_block_fused


def fold_bn(bn_params, bn_stats, eps: float = 1e-5):
    """Eval BatchNorm as per-channel affine: y = x * scale + bias."""
    scale = bn_params["scale"] * lax.rsqrt(bn_stats["var"] + eps)
    bias = bn_params["bias"] - bn_stats["mean"] * scale
    return scale, bias


def _fold_conv_bn(kernel, bias, scale, shift):
    """(x @ W + b) * s + t  ==  x @ (W s) + (b s + t)."""
    return kernel * scale[None, :], bias * scale + shift


def _fold_block(p, s, *, in_ch: int, out_ch: int, stride: int,
                block_residual: bool, kernel_size: int, dilations,
                static_A=None) -> dict:
    """Precompute all folded weights for one TCN_GCN_unit."""
    gp, gs = p["gcn1"], s["gcn1"]
    tp, ts = p["tcn1"], s["tcn1"]
    S, _, C = np.shape(gp["conv4_kernel"])
    fb: dict[str, Any] = {"stride": stride, "S": S, "C": C}

    fb["w12"] = gp["conv12"]["kernel"][0, 0]
    fb["b12"] = gp["conv12"]["bias"]
    fb["w3"] = gp["conv3"]["kernel"][0, 0]      # (Cin, S*C)
    fb["b3"] = gp["conv3"]["bias"]
    fb["w4s"] = gp["conv4_kernel"]
    fb["b4s"] = gp["conv4_bias"]
    fb["alpha"] = gp["alpha"]
    if "PA" in gp:
        fb["A"] = gp["PA"]
    elif static_A is not None:
        # adaptive=False: the adjacency is the static graph, not a param
        fb["A"] = jnp.asarray(static_A, jnp.float32)
    else:
        raise KeyError(
            "gcn1 has no 'PA' param (model built with adaptive=False?) and "
            "no static adjacency was provided to the fast-eval engine"
        )
    gy_s, gy_b = fold_bn(gp["bn"], gs["bn"])
    fb["gy"] = jnp.stack([gy_s, gy_b])

    if in_ch != out_ch:
        ds, db = fold_bn(gp["down_bn"], gs["down_bn"])
        fb["wd"], fb["bd"] = _fold_conv_bn(
            gp["down_conv"]["kernel"][0, 0], gp["down_conv"]["bias"], ds, db
        )
    else:
        fb["wd"] = fb["bd"] = None

    os_, ob = fold_bn(gp["offset_bn"], gs["offset_bn"])
    fb["wo"], fb["bo"] = _fold_conv_bn(
        gp["offset_conv"]["kernel"][0, 0], gp["offset_conv"]["bias"], os_, ob
    )

    # --- TCN: prefix conv+BN, branch convs (+out_bn fold), pw (+out_bn) ----
    ps_, pb = fold_bn(tp["prefix_bn"], ts["prefix_bn"])
    fb["wp"], fb["bp"] = _fold_conv_bn(
        tp["prefix_conv"]["kernel"][0, 0], tp["prefix_conv"]["bias"], ps_, pb
    )
    obn_s, obn_b = fold_bn(tp["out_bn"], ts["out_bn"])
    n_dil = len(dilations)
    bc = out_ch // (n_dil + 2)
    branches = []
    for i, dil in enumerate(dilations):
        k = tp[f"branch{i}_tconv_conv"]["kernel"]      # (ks, 1, bc, bc)
        b = tp[f"branch{i}_tconv_conv"]["bias"]
        sl = slice(i * bc, (i + 1) * bc)
        k = k * obn_s[sl][None, None, None, :]
        b = b * obn_s[sl] + obn_b[sl]
        branches.append((kernel_size, dil, k, b))
    fb["branches"] = branches
    mp_sl = slice(n_dil * bc, (n_dil + 1) * bc)
    fb["mp_scale"], fb["mp_bias"] = obn_s[mp_sl], obn_b[mp_sl]
    pw_sl = slice((n_dil + 1) * bc, (n_dil + 2) * bc)
    fb["wpw"], fb["bpw"] = _fold_conv_bn(
        tp["pw_conv"]["kernel"][0, 0], tp["pw_conv"]["bias"],
        obn_s[pw_sl], obn_b[pw_sl],
    )

    # --- block residual: none / identity / folded strided 1x1 conv+BN ------
    if not block_residual:
        fb["res"] = "none"
    elif in_ch == out_ch and stride == 1:
        fb["res"] = "identity"
    else:
        rs, rb = fold_bn(p["residual"]["bn"], s["residual"]["bn"])
        fb["res"] = "conv"
        fb["wres"], fb["bres"] = _fold_conv_bn(
            p["residual"]["conv"]["kernel"][0, 0], p["residual"]["conv"]["bias"],
            rs, rb,
        )
    return fb


def _block_prefix_pw_xla(fb: dict, x: jax.Array, x1s, x2s):
    """Folded-affine lowering of the kernel's fused segment, for blocks
    where the whole-block Pallas kernel does not pay. The aggregation
    itself goes through the production `unit_ctr_gc` dispatch (the
    register-tiled Pallas kernels on TPU — round 4; previously this path
    ran the raw XLA einsum, which materialises the (N, V, V, S*C) refined
    adjacency to HBM and measures 3-11x slower at the backbone shapes)."""
    from ..ops.aggregation import unit_ctr_gc

    x3 = x @ fb["w3"] + fb["b3"]                    # (N, T, V, S*C)
    y = unit_ctr_gc(x1s, x2s, x3, fb["w4s"], fb["b4s"], fb["alpha"],
                    fb["A"])
    y = y * fb["gy"][0] + fb["gy"][1]
    res = x if fb["wd"] is None else x @ fb["wd"] + fb["bd"]
    off = jnp.tanh((res - y) @ fb["wo"] + fb["bo"])
    h = nn_relu(y + off + res)
    prefix = nn_relu(h @ fb["wp"] + fb["bp"])
    pw = h @ fb["wpw"] + fb["bpw"]
    return prefix, pw


def _apply_block(fb: dict, x: jax.Array, use_kernel: bool) -> jax.Array:
    """One fused TCN_GCN_unit forward. x (NM, T, V, Cin)."""
    S, C, stride = fb["S"], fb["C"], fb["stride"]
    R = fb["w4s"].shape[1]
    NM, T, V, _ = x.shape

    # conv12 on the T-mean (1x1 conv commutes with the T pool,
    # reference models/ctrgcn.py:173)
    e12 = jnp.mean(x, axis=1) @ fb["w12"] + fb["b12"]      # (NM, V, 2SR)
    x1s = jnp.transpose(
        e12[..., : S * R].reshape(NM, V, S, R), (0, 2, 1, 3)
    )
    x2s = jnp.transpose(
        e12[..., S * R:].reshape(NM, V, S, R), (0, 2, 1, 3)
    )

    if use_kernel:
        prefix, pw = gcn_tcn_block_fused(
            x, x1s, x2s, fb["w3"], fb["b3"], fb["w4s"], fb["b4s"],
            fb["alpha"], fb["A"], fb["gy"], fb["wo"], fb["bo"],
            fb["wp"], fb["bp"], fb["wpw"], fb["bpw"], fb["wd"], fb["bd"],
        )
    else:
        prefix, pw = _block_prefix_pw_xla(fb, x, x1s, x2s)

    n_dil = len(fb["branches"])
    bc = C // (n_dil + 2)
    outs = []
    for i, (ks, dil, kern, bias) in enumerate(fb["branches"]):
        seg = prefix[..., i * bc:(i + 1) * bc]
        pad = (ks + (ks - 1) * (dil - 1) - 1) // 2
        y = lax.conv_general_dilated(
            seg, kern, window_strides=(stride, 1),
            padding=[(pad, pad), (0, 0)], rhs_dilation=(dil, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        outs.append(y + bias)
    mp = lax.reduce_window(
        prefix[..., n_dil * bc:], -jnp.inf, lax.max,
        (1, 3, 1, 1), (1, stride, 1, 1),
        [(0, 0), (1, 1), (0, 0), (0, 0)],
    )
    outs.append(mp * fb["mp_scale"] + fb["mp_bias"])
    outs.append(pw[:, ::stride])
    out = jnp.concatenate(outs, axis=-1)

    if fb["res"] == "identity":
        out = out + x
    elif fb["res"] == "conv":
        out = out + (x[:, ::stride] @ fb["wres"] + fb["bres"])
    return nn_relu(out)


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def make_fast_eval_fn(model, use_pallas: bool | None = None):
    """Jitted ``fn(variables, x) -> logits`` equivalent to
    ``model.apply(variables, x, train=False)``.

    The BN folding runs inside the traced function (a handful of per-channel
    multiplies — negligible next to the forward), so one compilation serves
    every checkpoint/epoch of the same model. use_pallas=None dispatches
    the whole-block fused kernel per block by the TAMGCN_FAST_EVAL_BLOCKS
    policy ('none' default — every block runs the register-tiled
    aggregation kernels + the folded-affine epilogue, the measured-fastest
    config on the v5e at both NW-UCLA and NTU shapes; 'deep'/'shallow'/
    'all' switch the whole-block kernel on by channel width for
    comparison); True/False force one path everywhere.
    """
    import os

    from .ctrgcn import CTRGCN, TCNGCNUnit, get_graph

    # Validate before resolving the dispatch policy: policy resolution reads
    # model.num_point and may return the flax path early, so a non-CTRGCN
    # model must fail with the intended TypeError here, not an AttributeError.
    if not isinstance(model, CTRGCN):
        raise TypeError(
            f"make_fast_eval_fn requires a CTRGCN model, got "
            f"{type(model).__name__}"
        )

    policy = os.environ.get("TAMGCN_FAST_EVAL_BLOCKS", "auto")
    if policy == "auto" and use_pallas is None:
        # measured dispatch (v5e, round 4): the folded-affine engine wins at
        # the NTU shapes (23.9 vs 27.3 ms, V=25 T=64) and loses at NW-UCLA
        # (10.1 vs 9.0 ms, V=20 T=52) — --fast_eval must never pessimize,
        # so small-graph configs take the plain flax eval path (which
        # already runs the register-tiled aggregation kernels)
        policy = "none" if model.num_point > 20 else "flax"
    if policy == "flax" and use_pallas is None:
        return jax.jit(lambda variables, x: model.apply(
            variables, x, train=False))

    # Block topology mirrors CTRGCN.setup (channel doubling at l5/l8);
    # kernel_size/dilations come from TCNGCNUnit's field defaults — the
    # single block config CTRGCN constructs (models/ctrgcn.py setup()).
    bc = model.base_channel
    specs = [
        (model.in_channels, bc, 1, False),
        (bc, bc, 1, True), (bc, bc, 1, True), (bc, bc, 1, True),
        (bc, bc * 2, 2, True), (bc * 2, bc * 2, 1, True),
        (bc * 2, bc * 2, 1, True), (bc * 2, bc * 4, 2, True),
        (bc * 4, bc * 4, 1, True), (bc * 4, bc * 4, 1, True),
    ]
    fields = {f.name: f.default for f in TCNGCNUnit.__dataclass_fields__.values()}
    kernel_size = fields["kernel_size"]
    dilations = tuple(fields["dilations"])
    # CTRGCN.setup constructs every block with TCNGCNUnit's defaults, so the
    # class defaults ARE the instance config today; if temporal settings are
    # ever lifted into CTRGCN fields, fail here instead of folding the wrong
    # dilated-conv geometry silently.
    for fname in ("kernel_size", "dilations"):
        if hasattr(model, fname):
            raise NotImplementedError(
                f"CTRGCN grew a configurable {fname!r}; make_fast_eval_fn "
                "must read it off the model instead of TCNGCNUnit defaults"
            )
    # static adjacency fallback for adaptive=False models (no 'PA' param)
    if isinstance(model.graph, np.ndarray):
        static_A = model.graph
    elif isinstance(model.graph, str):
        static_A = get_graph(model.graph, **(model.graph_args or {})).A
    elif model.graph is not None:
        static_A = model.graph.A
    else:
        static_A = None
    num_point = model.num_point

    @jax.jit
    def forward(variables, x):
        params, stats = variables["params"], variables["batch_stats"]
        blocks = []
        for idx, (cin, cout, stride, resid) in enumerate(specs, 1):
            blocks.append(_fold_block(
                params[f"l{idx}"], stats[f"l{idx}"],
                in_ch=cin, out_ch=cout, stride=stride, block_residual=resid,
                kernel_size=kernel_size, dilations=dilations,
                static_A=static_A,
            ))
        dbn_scale, dbn_bias = fold_bn(params["data_bn"], stats["data_bn"])
        fc_k, fc_b = params["fc"]["kernel"], params["fc"]["bias"]
        if x.ndim == 3:  # (N, T, V*C) NW-UCLA feeder layout
            N, T, VC = x.shape
            x = x.reshape(N, T, num_point, VC // num_point)
            x = jnp.transpose(x, (0, 3, 1, 2))[..., None]
        N, C0, T, V, M = x.shape
        h = jnp.transpose(x, (0, 2, 4, 3, 1)).reshape(N, T, M * V * C0)
        h = h * dbn_scale + dbn_bias
        h = h.reshape(N, T, M, V, C0)
        h = jnp.transpose(h, (0, 2, 1, 3, 4)).reshape(N * M, T, V, C0)
        for (cin, cout, stride, resid), fb in zip(specs, blocks):
            if use_pallas is not None:
                use_kernel = use_pallas
            elif policy == "deep":
                use_kernel = cout >= 128
            elif policy == "shallow":
                use_kernel = cout < 128
            elif policy == "all":
                use_kernel = True
            else:  # "none": tiled-agg + folded-affine everywhere
                use_kernel = False
            h = _apply_block(fb, h, use_kernel)
        c_new = h.shape[-1]
        h = h.reshape(N, M, -1, c_new).mean(axis=2).mean(axis=1)
        return h @ fc_k + fc_b

    return forward


def make_fast_eval(model, variables, use_pallas: bool | None = None):
    """Convenience: bind `variables` — returns ``fast(x) -> logits``."""
    fn = make_fast_eval_fn(model, use_pallas=use_pallas)
    return lambda x: fn(variables, x)
