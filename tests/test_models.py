"""Model construction / shape / init-scheme tests (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamgcn_tpu.models import create_ctrgcn_nucla, create_stgcn_nucla, get_model


@pytest.fixture(scope="module")
def ctrgcn_vars():
    model = create_ctrgcn_nucla()
    x = jnp.zeros((2, 3, 52, 20, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_ctrgcn_forward_shape(ctrgcn_vars):
    model, variables = ctrgcn_vars
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 52, 20, 1), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    assert jnp.isfinite(out).all()


def test_ctrgcn_train_mode_updates_batch_stats(ctrgcn_vars):
    model, variables = ctrgcn_vars
    x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 52, 20, 1), jnp.float32)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, 10)
    old = variables["batch_stats"]["data_bn"]["mean"]
    new = mutated["batch_stats"]["data_bn"]["mean"]
    assert not np.allclose(old, new)


def test_ctrgcn_flat_input_layout(ctrgcn_vars):
    """(N, T, V*C) inputs follow the reference reshape path (models/ctrgcn.py:325-327)."""
    model, variables = ctrgcn_vars
    r = np.random.RandomState(2).randn(2, 3, 52, 20, 1).astype(np.float32)
    x5 = jnp.asarray(r)
    # reference: x.view(N, T, V, C).permute(0,3,1,2) == inverse of this packing
    x3 = jnp.transpose(x5[..., 0], (0, 2, 3, 1)).reshape(2, 52, 20 * 3)
    np.testing.assert_allclose(
        model.apply(variables, x5, train=False),
        model.apply(variables, x3, train=False),
        rtol=1e-5,
        atol=1e-5,
    )


def test_ctrgcn_extract_feature(ctrgcn_vars):
    model, variables = ctrgcn_vars
    x = jnp.asarray(np.random.RandomState(3).randn(2, 3, 52, 20, 1), jnp.float32)
    feat, feat2 = model.apply(variables, x, train=False, method="extract_feature")
    # T=52 -> 26 -> 13 via the two stride-2 blocks; C=256
    assert feat.shape == (2, 256, 13, 20, 1)
    np.testing.assert_array_equal(feat, feat2)


def test_ctrgcn_init_schemes(ctrgcn_vars):
    _, variables = ctrgcn_vars
    p = variables["params"]
    # adaptive adjacency initialised from the static graph partitions
    from tamgcn_tpu.graphs import get_graph

    np.testing.assert_allclose(
        p["l1"]["gcn1"]["PA"], get_graph("ucla").A.astype(np.float32), atol=1e-6
    )
    # alpha starts at 0 -> dynamic topology off at init (reference :229)
    assert float(p["l1"]["gcn1"]["alpha"][0]) == 0.0
    # TAM offset conv zero-init (reference :241-244)
    assert np.all(p["l1"]["gcn1"]["offset_conv"]["kernel"] == 0)
    # unit_gcn bn scale 1e-6 (reference :240)
    np.testing.assert_allclose(p["l1"]["gcn1"]["bn"]["scale"], 1e-6)


def test_stgcn_forward_shape():
    model = create_stgcn_nucla()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 52, 20, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    # 10 per-layer edge-importance masks of shape (3, 20, 20), init to ones
    for i in range(10):
        ei = variables["params"][f"edge_importance_{i}"]
        assert ei.shape == (3, 20, 20)
        np.testing.assert_array_equal(ei, np.ones((3, 20, 20)))


def test_stgcn_extract_feature():
    model = create_stgcn_nucla()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 52, 20, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    output, feature = model.apply(
        variables, x, train=False, method="extract_feature"
    )
    assert feature.shape == (2, 256, 13, 20, 1)
    assert output.shape == (2, 10, 13, 20, 1)


def test_edge_importance_per_joint():
    from tamgcn_tpu.models import edge_importance_per_joint

    masks = [np.ones((3, 20, 20)) for _ in range(10)]
    scores = edge_importance_per_joint(masks)
    assert scores.shape == (20,)
    np.testing.assert_allclose(scores, 1.0)


def test_model_registry():
    m = get_model("models.ctrgcn.Model", num_class=10, num_point=20,
                  num_person=1, graph="ucla")
    assert m.num_class == 10


def test_ctrgcn_bf16_compute_dtype():
    """Mixed precision: bf16 activations, f32 params/BN stats; finite grads."""
    import jax
    import jax.numpy as jnp
    import optax

    from tamgcn_tpu.models import get_model

    model = get_model(
        "ctrgcn", num_class=10, num_point=20, num_person=1, graph="ucla",
        dtype="bfloat16",
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 16, 20, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # params stay f32
    assert all(
        l.dtype == jnp.float32
        for l in jax.tree_util.tree_leaves(variables["params"])
    )
    logits = model.apply(variables, x, train=False)
    assert logits.dtype == jnp.float32 and logits.shape == (2, 10)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            out, jnp.asarray([1, 2])
        ).mean()

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
        assert leaf.dtype == jnp.float32


def test_rgb_models_bf16_mixed_precision():
    """Round-5: the RGB branch supports bf16 mixed precision like the GCN —
    compute in bf16, params f32, logits promoted to f32 (measured 1.54x on
    the v5e, docs/KERNELS.md "bf16 RGB branch")."""
    from tamgcn_tpu.models.resnet_gcn_attention import ResNetGCNAttention
    from tamgcn_tpu.models.resnet_only import ResNetOnly

    rs = np.random.RandomState(0)
    m = ResNetOnly(num_class=10, dtype=jnp.bfloat16)
    x = jnp.asarray(rs.randn(2, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x[:1])
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 10) and out.dtype == jnp.float32
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(v["params"])
    )

    fm = ResNetGCNAttention(
        num_class=10, num_point=20, num_person=1, graph="ucla",
        use_pallas=False, dtype=jnp.bfloat16,
    )
    xg = jnp.asarray(rs.randn(2, 3, 16, 20, 1), jnp.float32)
    xr = jnp.asarray(rs.randn(2, 64, 64, 15), jnp.float32)
    vf = fm.init(jax.random.PRNGKey(0), xg[:1], xr[:1])
    out = fm.apply(vf, xg, xr, train=False)
    assert out.shape == (2, 10) and out.dtype == jnp.float32
