"""Pallas fused CTR-GC kernel vs the XLA einsum oracle (interpret mode on CPU).

Numerics gate for the kernel: forward allclose and full VJP allclose against
tamgcn_tpu.ops.ctr_gc_fused_xla for both NW-UCLA (V=20) and NTU (V=25)
shapes, including non-aligned channel counts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamgcn_tpu.ops.aggregation import ctr_gc_fused_xla
from tamgcn_tpu.ops.pallas.ctr_gc import ctr_gc_fused_pallas


def _make_inputs(n=3, t=13, v=20, c=64, r=8, seed=0):
    rs = np.random.RandomState(seed)
    x1 = jnp.asarray(rs.randn(n, v, r), jnp.float32)
    x2 = jnp.asarray(rs.randn(n, v, r), jnp.float32)
    x3 = jnp.asarray(rs.randn(n, t, v, c), jnp.float32)
    w4 = jnp.asarray(rs.randn(r, c) * 0.1, jnp.float32)
    b4 = jnp.asarray(rs.randn(c) * 0.1, jnp.float32)
    alpha = jnp.asarray([0.7], jnp.float32)
    A = jnp.asarray(rs.rand(v, v), jnp.float32)
    return x1, x2, x3, w4, b4, alpha, A


@pytest.mark.parametrize(
    "shape",
    [
        dict(n=2, t=52, v=20, c=64, r=8),    # NW-UCLA layer 1
        dict(n=2, t=13, v=20, c=256, r=32),  # NW-UCLA layer 9-10
        dict(n=2, t=16, v=25, c=128, r=16),  # NTU mid layers
        dict(n=1, t=7, v=20, c=96, r=12),    # non-aligned channels
    ],
)
def test_forward_matches_xla(shape):
    args = _make_inputs(**shape)
    got = np.asarray(ctr_gc_fused_pallas(*args))
    want = np.asarray(ctr_gc_fused_xla(*args))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_none_bias():
    x1, x2, x3, w4, _, alpha, A = _make_inputs()
    got = np.asarray(ctr_gc_fused_pallas(x1, x2, x3, w4, None, alpha, A))
    want = np.asarray(ctr_gc_fused_xla(x1, x2, x3, w4, None, alpha, A))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vjp_matches_xla():
    args = _make_inputs(n=2, t=8, v=20, c=64, r=8)

    def loss_pallas(*a):
        return jnp.sum(jnp.sin(ctr_gc_fused_pallas(*a)))

    def loss_xla(*a):
        return jnp.sum(jnp.sin(ctr_gc_fused_xla(*a)))

    g_pallas = jax.grad(loss_pallas, argnums=tuple(range(7)))(*args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
    names = ["x1", "x2", "x3", "w4", "b4", "alpha", "A"]
    for name, gp, gx in zip(names, g_pallas, g_xla):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_alpha_zero_reduces_to_static_adjacency():
    """With alpha=0 the op must equal plain aggregation with the static A."""
    x1, x2, x3, w4, b4, _, A = _make_inputs(n=2, t=8, v=20, c=64, r=8)
    alpha = jnp.zeros((1,), jnp.float32)
    got = np.asarray(ctr_gc_fused_pallas(x1, x2, x3, w4, b4, alpha, A))
    want = np.asarray(jnp.einsum("uv,ntvc->ntuc", A, x3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_model_with_pallas_matches_xla_path():
    """Full CTRGCN forward: use_pallas=True (interpret) == use_pallas=False."""
    from tamgcn_tpu.models import create_ctrgcn_nucla

    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 20, 20, 1), jnp.float32)
    m_x = create_ctrgcn_nucla(use_pallas=False)
    m_p = create_ctrgcn_nucla(use_pallas=True)
    v = m_x.init(jax.random.PRNGKey(0), x, train=False)
    out_x = np.asarray(m_x.apply(v, x, train=False))
    out_p = np.asarray(m_p.apply(v, x, train=False))
    np.testing.assert_allclose(out_p, out_x, rtol=2e-4, atol=2e-4)


# --- unit-level (3-subset) fused op -----------------------------------------

from tamgcn_tpu.ops.aggregation import (  # noqa: E402
    _unit_ctr_gc_pallas,
    unit_ctr_gc,
    unit_ctr_gc_xla,
)


def _make_unit_inputs(n=2, t=13, v=20, c=128, r=16, s=3, seed=0):
    rs = np.random.RandomState(seed)
    x1s = jnp.asarray(rs.randn(n, s, v, r), jnp.float32)
    x2s = jnp.asarray(rs.randn(n, s, v, r), jnp.float32)
    x3s = jnp.asarray(rs.randn(n, t, v, s * c), jnp.float32)
    w4s = jnp.asarray(rs.randn(s, r, c) * 0.1, jnp.float32)
    b4s = jnp.asarray(rs.randn(s, c) * 0.1, jnp.float32)
    alpha = jnp.asarray([0.7], jnp.float32)
    As = jnp.asarray(rs.rand(s, v, v), jnp.float32)
    return x1s, x2s, x3s, w4s, b4s, alpha, As


@pytest.mark.parametrize(
    "shape",
    [
        dict(n=2, t=13, v=20, c=256, r=32),  # NW-UCLA deep layers
        dict(n=2, t=26, v=20, c=128, r=16),  # mid layers
        dict(n=1, t=8, v=25, c=128, r=16),   # NTU joints
        dict(n=2, t=9, v=20, c=128, r=16),   # odd T: T-block divisor logic
    ],
)
def test_unit_fwd_matches_xla(shape):
    args = _make_unit_inputs(**shape)
    got = np.asarray(_unit_ctr_gc_pallas(*args))
    want = np.asarray(unit_ctr_gc_xla(*args))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_unit_vjp_matches_xla_odd_t():
    """Odd T exercises the backward's divisor-only T-block selection."""
    args = _make_unit_inputs(n=2, t=9, v=20, c=128, r=16)

    def f_pallas(*a):
        return jnp.sum(jnp.sin(_unit_ctr_gc_pallas(*a)))

    def f_xla(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc_xla(*a)))

    gp = jax.grad(f_pallas, argnums=(0, 2, 3, 6))(*args)
    gx = jax.grad(f_xla, argnums=(0, 2, 3, 6))(*args)
    for name, a, b in zip(["x1s", "x3s", "w4s", "As"], gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_unit_vjp_matches_xla():
    args = _make_unit_inputs(n=2, t=13, v=20, c=128, r=16)

    def f_pallas(*a):
        return jnp.sum(jnp.sin(_unit_ctr_gc_pallas(*a)))

    def f_xla(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc_xla(*a)))

    gp = jax.grad(f_pallas, argnums=tuple(range(7)))(*args)
    gx = jax.grad(f_xla, argnums=tuple(range(7)))(*args)
    names = ["x1s", "x2s", "x3s", "w4s", "b4s", "alpha", "As"]
    for name, a, b in zip(names, gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


@pytest.mark.parametrize("form", ["roll", "bcast", "tile"])
def test_unit_vjp_both_forms_match_xla(form, monkeypatch):
    """Both kernel schedules (serial roll-diagonal and source-joint
    broadcast) compute the identical op, forward and full gradient set."""
    monkeypatch.setenv("TAMGCN_CTR_GC_FORM", form)
    args = _make_unit_inputs(n=2, t=13, v=20, c=128, r=16)

    def f_pallas(*a):
        return jnp.sum(jnp.sin(_unit_ctr_gc_pallas(*a)))

    def f_xla(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc_xla(*a)))

    np.testing.assert_allclose(
        np.asarray(_unit_ctr_gc_pallas(*args)),
        np.asarray(unit_ctr_gc_xla(*args)),
        rtol=2e-5, atol=2e-5,
    )
    gp = jax.grad(f_pallas, argnums=tuple(range(7)))(*args)
    gx = jax.grad(f_xla, argnums=tuple(range(7)))(*args)
    names = ["x1s", "x2s", "x3s", "w4s", "b4s", "alpha", "As"]
    for name, a, b in zip(names, gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch ({form}): {name}",
        )


def test_unit_dispatch_fallback_on_cpu():
    # on CPU (tests force JAX_PLATFORMS=cpu) auto-dispatch takes the XLA path
    args = _make_unit_inputs(n=1, t=4, v=20, c=64, r=8)
    got = np.asarray(unit_ctr_gc(*args))
    want = np.asarray(unit_ctr_gc_xla(*args))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["fold", "unfold", "xla"])
def test_narrow_dispatch_modes_agree(mode, monkeypatch):
    """TAMGCN_NARROW_DISPATCH selects the C=64 implementation (folded
    pallas / unfolded pallas / XLA) for in-context A/B measurement; all
    three must compute the identical op, fwd + vjp."""
    monkeypatch.setenv("TAMGCN_NARROW_DISPATCH", mode)
    args = _make_unit_inputs(n=2, t=8, v=20, c=64, r=8)
    use_pallas = None if mode == "xla" else True

    def f(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc(*a, use_pallas=use_pallas)))

    np.testing.assert_allclose(
        np.asarray(unit_ctr_gc(*args, use_pallas=use_pallas)),
        np.asarray(unit_ctr_gc_xla(*args)),
        rtol=2e-5, atol=2e-5,
    )
    gp = jax.grad(f, argnums=tuple(range(7)))(*args)
    gx = jax.grad(lambda *a: jnp.sum(jnp.sin(unit_ctr_gc_xla(*a))),
                  argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x1s", "x2s", "x3s", "w4s", "b4s", "alpha", "As"],
                          gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"narrow-dispatch ({mode}) grad mismatch: {name}",
        )


def test_unit_narrow_channel_path_matches_xla():
    """Narrow channels (C=64, S*C=192 lanes): the unfolded Pallas path
    (broadcast-form default, 192->256 lane pad) == XLA, fwd + full vjp.

    Round 4 retired the round-2/3 time-pair fold — the fold/unfold XLA
    lane-interleave transposes cost more than the lane pad they avoided
    (see ops/aggregation.unit_ctr_gc)."""
    args = _make_unit_inputs(n=2, t=8, v=20, c=64, r=8)

    def f_pallas(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc(*a, use_pallas=True)))

    def f_xla(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc_xla(*a)))

    np.testing.assert_allclose(
        np.asarray(unit_ctr_gc(*args, use_pallas=True)),
        np.asarray(unit_ctr_gc_xla(*args)),
        rtol=2e-5, atol=2e-5,
    )
    gp = jax.grad(f_pallas, argnums=tuple(range(7)))(*args)
    gx = jax.grad(f_xla, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x1s", "x2s", "x3s", "w4s", "b4s", "alpha", "As"], gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"narrow-channel grad mismatch: {name}",
        )


def test_unit_ctr_gc_conv3_fused_matches_xla(monkeypatch):
    """The conv3-VJP-fused custom op (round 5; built, measured in-context,
    and RETIRED — docs/KERNELS.md "Round 5") stays numerically exact: with
    TAMGCN_FUSE_CONV3=1 the fused kernel (interpret mode) matches the XLA
    composition conv3_matmul + unit_ctr_gc_xla, forward and full VJP
    including dW3/db3/dx."""
    from tamgcn_tpu.ops.aggregation import conv3_matmul, unit_ctr_gc_conv3

    monkeypatch.setenv("TAMGCN_FUSE_CONV3", "1")
    rs = np.random.RandomState(0)
    n, t, v, c, r, s, cin = 2, 8, 20, 128, 16, 3, 64
    args = (
        jnp.asarray(rs.randn(n, t, v, cin) * 0.3, jnp.float32),
        jnp.asarray(rs.randn(cin, s * c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(s * c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(n, s, v, r) * 0.3, jnp.float32),
        jnp.asarray(rs.randn(n, s, v, r) * 0.3, jnp.float32),
        jnp.asarray(rs.randn(s, r, c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(s, c) * 0.1, jnp.float32),
        jnp.asarray([0.7], jnp.float32),
        jnp.asarray(rs.rand(s, v, v), jnp.float32),
    )

    def loss_fused(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc_conv3(*a, use_pallas=True)))

    def loss_ref(x, w3, b3, x1s, x2s, w4s, b4s, alpha, As):
        x3s = conv3_matmul(x, w3, b3)
        return jnp.sum(
            jnp.sin(unit_ctr_gc_xla(x1s, x2s, x3s, w4s, b4s, alpha, As))
        )

    got = unit_ctr_gc_conv3(*args, use_pallas=True)
    want = unit_ctr_gc_xla(
        args[3], args[4], conv3_matmul(*args[:3]), *args[5:]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ["dx", "dw3", "db3", "dx1s", "dx2s", "dw4s", "db4s", "dalpha",
             "dAs"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4, err_msg=name
        )


def test_unit_param_flat_schedule_matches_tile(monkeypatch):
    """Round-5 flat-2D param-grad schedule (relayout-free phase C, BN=1)
    == the round-4 tile schedule == XLA, full VJP. The deep shape's
    backward blocks pick bn=1, so TAMGCN_PARAM_SCHED selects between the
    two kernels there."""
    args = _make_unit_inputs(n=2, t=13, v=20, c=256, r=32)

    def f(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc(*a, use_pallas=True)))

    def f_xla(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc_xla(*a)))

    grads = {}
    for sched in ("flat", "tile"):
        monkeypatch.setenv("TAMGCN_PARAM_SCHED", sched)
        grads[sched] = jax.grad(f, argnums=tuple(range(7)))(*args)
    gx = jax.grad(f_xla, argnums=tuple(range(7)))(*args)
    names = ["x1s", "x2s", "x3s", "w4s", "b4s", "alpha", "As"]
    for name, a, b, c_ in zip(names, grads["flat"], grads["tile"], gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"flat vs tile: {name}",
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c_), rtol=2e-4, atol=2e-4,
            err_msg=f"flat vs xla: {name}",
        )


def test_unit_vjp_ntu_v25_matches_xla():
    """NTU joint count (V=25, sublane-padded to 32; V*V=625 rows pad to 632
    in the flat param schedule): unit-level kernels == XLA, fwd + full VJP.
    bn=1 at this shape, so the round-5 flat schedule is the one under test."""
    args = _make_unit_inputs(n=2, t=16, v=25, c=128, r=16)

    def f_pallas(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc(*a, use_pallas=True)))

    def f_xla(*a):
        return jnp.sum(jnp.sin(unit_ctr_gc_xla(*a)))

    np.testing.assert_allclose(
        np.asarray(unit_ctr_gc(*args, use_pallas=True)),
        np.asarray(unit_ctr_gc_xla(*args)),
        rtol=2e-5, atol=2e-5,
    )
    gp = jax.grad(f_pallas, argnums=tuple(range(7)))(*args)
    gx = jax.grad(f_xla, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x1s", "x2s", "x3s", "w4s", "b4s", "alpha", "As"],
                          gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"V=25 grad mismatch: {name}",
        )
