"""Interpretability tests: gradient body-part importance (small model, CPU)."""
import jax
import numpy as np

from tamgcn_tpu.data import Loader, get_feeder
from tamgcn_tpu.interpret import (
    NUCLA_TARGET_JOINTS,
    gradient_body_part_importance,
    make_input_grad_fn,
)
from tamgcn_tpu.models import create_stgcn_nucla


def test_gradient_importance_shapes_and_normalisation():
    model = create_stgcn_nucla()
    feeder = get_feeder("synthetic_gcn", num_samples=24, split="train")
    loader = Loader(feeder, batch_size=8, shuffle=False)
    x = np.zeros((2, 3, 52, 20, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    weights = gradient_body_part_importance(
        model, variables, loader, num_class=10, samples_per_class=2
    )
    assert set(weights) == set(range(10))
    for g, parts in weights.items():
        assert set(parts) == set(NUCLA_TARGET_JOINTS)
        vals = list(parts.values())
        assert max(vals) <= 1.0 + 1e-6
        # classes actually seen get a max of exactly 1
        if any(v > 0 for v in vals):
            assert max(vals) == 1.0


def test_input_grad_fn_shape():
    model = create_stgcn_nucla()
    x = np.random.RandomState(0).randn(4, 3, 52, 20, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fn = make_input_grad_fn(model, variables)
    g = fn(x, np.array([0, 1, 2, 3]))
    assert g.shape == (4, 20)
    assert np.all(np.asarray(g) >= 0)
