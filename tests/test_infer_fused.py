"""Fused GCN+TCN block inference engine vs the flax eval forward.

`ctrgcn_infer.make_fast_eval` folds every eval BatchNorm into the adjacent
1x1 conv and runs each TCN_GCN_unit through the fused Pallas block kernel
(interpret mode on CPU); its logits must match
``model.apply(variables, x, train=False)`` to fp32 tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamgcn_tpu.models import create_ctrgcn_nucla
from tamgcn_tpu.models.ctrgcn_infer import make_fast_eval


@pytest.fixture(scope="module")
def model_and_vars():
    model = create_ctrgcn_nucla(use_pallas=False)
    x = jnp.zeros((1, 3, 8, 20, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


@pytest.mark.parametrize("use_pallas,policy", [
    (True, None),      # every block through the whole-block fused kernel
    (None, "none"),    # engine: tiled-agg + folded-affine everywhere
    (None, "auto"),    # production dispatch (V=20 -> routes to flax eval)
], ids=["kernel-all", "engine", "auto"])
def test_fast_eval_matches_flax(model_and_vars, use_pallas, policy,
                                monkeypatch):
    """All make_fast_eval dispatch policies agree with the flax eval."""
    model, variables = model_and_vars
    if policy is not None:
        monkeypatch.setenv("TAMGCN_FAST_EVAL_BLOCKS", policy)
    # non-trivial batch stats: perturb them so the BN folding is exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.RandomState(1).standard_normal(a.shape)
        .astype(a.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    x = jnp.asarray(
        np.random.RandomState(2).randn(2, 3, 8, 20, 1), jnp.float32
    )
    want = np.asarray(model.apply(variables, x, train=False))
    fast = make_fast_eval(model, variables, use_pallas=use_pallas)
    got = np.asarray(fast(x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_trainer_fast_eval_flag(tmp_path):
    """--fast_eval routes test_epoch through the fused block engine and
    scores every sample identically (to fp32 tolerance) to the flax path."""
    from tamgcn_tpu.train.config import load_config
    from tamgcn_tpu.train.trainer import RecognitionTrainer

    common = ["-c", "configs/nucla/smoke.yaml", "--save_result", "true"]
    arg_a = load_config(common + ["-w", str(tmp_path / "a")])
    arg_b = load_config(
        common + ["-w", str(tmp_path / "b"), "--fast_eval", "true"]
    )
    ta = RecognitionTrainer(arg_a)
    tb = RecognitionTrainer(arg_b)
    loss_a, top1_a, _ = ta.test_epoch()
    loss_b, top1_b, _ = tb.test_epoch()
    # the two paths differ by MXU-accumulation noise on real TPUs, which can
    # flip argmaxes between near-tied logits: gate on the scores (the real
    # numerics contract) and allow top1 a small epsilon
    n = len(ta.result_scores)
    assert abs(top1_a - top1_b) <= 2.0 / max(n, 1)
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-3)
    np.testing.assert_allclose(
        ta.result_scores, tb.result_scores, rtol=2e-3, atol=2e-4
    )


def test_fast_eval_feeder_layout(model_and_vars):
    """(N, T, V*C) feeder layout takes the same path as the flax model."""
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8, 60), jnp.float32)
    want = np.asarray(model.apply(variables, x, train=False))
    fast = make_fast_eval(model, variables)
    got = np.asarray(fast(x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
