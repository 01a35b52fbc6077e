"""Per-layer numerical parity vs the reference PyTorch implementation.

Loads the reference models directly from /root/reference (read-only mount),
copies their randomly-initialised weights into this framework's flax pytrees
via tamgcn_tpu.utils.torch_import, and asserts forward activations match
per block and at the logits — the BASELINE.json "per-layer allclose" target.

Skipped automatically when /root/reference or torch is unavailable.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)



def assert_close(got, want, rtol=1e-4, frac_atol=2e-7, err_msg=""):
    """allclose with atol scaled to the reference tensor's magnitude.

    Untrained eval-mode BN amplifies activations to ~1e4, so a fixed atol is
    meaningless; frac_atol=2e-7 allows ~fp32-accumulation-level noise relative
    to the tensor scale.
    """
    want = np.asarray(want)
    atol = max(float(np.abs(want).max()), 1.0) * frac_atol * 1e3
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=rtol, atol=atol, err_msg=err_msg
    )


def _to_numpy_state(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _rand_input(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.fixture(scope="module")
def ctrgcn_pair():
    import jax

    from models.ctrgcn import Model as RefModel  # reference models/ctrgcn.py

    from tamgcn_tpu.models import create_ctrgcn_nucla
    from tamgcn_tpu.utils.torch_import import import_ctrgcn_state_dict

    torch.manual_seed(0)
    ref = RefModel(
        num_class=10, num_point=20, num_person=1,
        graph="graph.ucla.Graph", graph_args={"labeling_mode": "spatial"},
    )
    ref.eval()

    ours = create_ctrgcn_nucla(use_pallas=False)
    x = _rand_input((2, 3, 52, 20, 1))
    init_vars = ours.init(jax.random.PRNGKey(0), x, train=False)
    variables = import_ctrgcn_state_dict(_to_numpy_state(ref))

    # every initialised leaf must be covered by the import (no silent misses)
    init_paths = {
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(init_vars)[0]
    }
    import_paths = {
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables)[0]
    }
    assert init_paths == import_paths, (
        f"missing={sorted(init_paths - import_paths)[:5]} "
        f"extra={sorted(import_paths - init_paths)[:5]}"
    )
    return ref, ours, variables, x


def test_ctrgcn_logits_parity(ctrgcn_pair):
    ref, ours, variables, x = ctrgcn_pair
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = np.asarray(ours.apply(variables, x, train=False))
    assert_close(out, ref_out)


def test_ctrgcn_per_block_parity(ctrgcn_pair):
    ref, ours, variables, x = ctrgcn_pair

    # torch per-block activations via forward hooks (N*M, C, T, V)
    ref_acts = {}

    def hook(name):
        def fn(_m, _i, out):
            ref_acts[name] = out.detach().numpy()

        return fn

    handles = [
        getattr(ref, f"l{i}").register_forward_hook(hook(f"l{i}"))
        for i in range(1, 11)
    ]
    with torch.no_grad():
        ref(torch.from_numpy(x))
    for h in handles:
        h.remove()

    # flax per-block activations via capture_intermediates (N*M, T, V, C)
    _, state = ours.apply(
        variables,
        x,
        train=False,
        capture_intermediates=lambda mdl, _name: type(mdl).__name__ == "TCNGCNUnit",
        mutable=["intermediates"],
    )
    inter = state["intermediates"]
    for i in range(1, 11):
        got = np.asarray(inter[f"l{i}"]["__call__"][0])  # (NM, T, V, C)
        got_nctv = np.transpose(got, (0, 3, 1, 2))
        want = ref_acts[f"l{i}"]
        assert_close(got_nctv, want, err_msg=f"block l{i} mismatch")


def test_ctrgcn_extract_feature_parity(ctrgcn_pair):
    ref, ours, variables, x = ctrgcn_pair
    with torch.no_grad():
        ref_feat, _ = ref.extract_feature(torch.from_numpy(x))
    feat, _ = ours.apply(variables, x, train=False, method="extract_feature")
    assert_close(feat, ref_feat.numpy())


def test_ctrgcn_train_mode_batchstats_parity(ctrgcn_pair):
    """Train-mode forward (batch-stat BN) must also match the reference."""
    ref, ours, variables, x = ctrgcn_pair
    ref.train()
    try:
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x)).numpy()
    finally:
        ref.eval()
    out, _ = ours.apply(variables, x, train=True, mutable=["batch_stats"])
    assert_close(out, ref_out, rtol=5e-3, frac_atol=1e-6)


def test_stgcn_parity():
    import jax

    from models.stgcn import Model as RefModel  # reference models/stgcn.py

    from tamgcn_tpu.models import create_stgcn_nucla
    from tamgcn_tpu.utils.torch_import import import_stgcn_state_dict

    torch.manual_seed(1)
    ref = RefModel(
        in_channels=3, num_class=10, num_point=20, num_person=1,
        graph="graph.ucla.Graph", graph_args={"labeling_mode": "spatial"},
    )
    ref.eval()
    # randomise edge importance away from ones so the mask path is exercised
    with torch.no_grad():
        for p in ref.edge_importance:
            p.copy_(torch.rand_like(p) + 0.5)

    ours = create_stgcn_nucla()
    x = _rand_input((2, 3, 52, 20, 1), seed=7)
    init_vars = ours.init(jax.random.PRNGKey(0), x, train=False)
    variables = import_stgcn_state_dict(_to_numpy_state(ref))
    assert jax.tree_util.tree_structure(init_vars) == jax.tree_util.tree_structure(
        variables
    )

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = np.asarray(ours.apply(variables, x, train=False))
    assert_close(out, ref_out)

    # extract_feature parity
    with torch.no_grad():
        ref_o, ref_f = ref.extract_feature(torch.from_numpy(x))
    o, f = ours.apply(variables, x, train=False, method="extract_feature")
    assert_close(f, ref_f.numpy())
    assert_close(o, ref_o.numpy())
