"""ResNet / cross-modal fusion parity vs the reference PyTorch implementation.

The reference's pretrained-URL download is unavailable offline; parity is
checked on randomly-initialised weights (the math is identical regardless),
with the URL loader monkeypatched for the fusion model whose constructor
hard-codes pretrained=True (reference resnet_gcn_attention.py:32).
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


def assert_close(got, want, rtol=1e-4, frac_atol=2e-4, err_msg=""):
    want = np.asarray(want)
    atol = max(float(np.abs(want).max()), 1.0) * frac_atol
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=rtol, atol=atol, err_msg=err_msg
    )


def _state(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def test_resnet50_parity():
    import jax

    from models.resnet import resnet50 as ref_resnet50  # reference

    from tamgcn_tpu.models.resnet import resnet50
    from tamgcn_tpu.utils.torch_import import import_resnet_state_dict

    torch.manual_seed(0)
    ref = ref_resnet50(pretrained=False, num_classes=10)
    ref.eval()

    ours = resnet50(num_classes=10)
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    init_vars = ours.init(jax.random.PRNGKey(0), x, train=False)
    variables = import_resnet_state_dict(_state(ref), skip_fc=False)
    assert jax.tree_util.tree_structure(init_vars) == jax.tree_util.tree_structure(
        variables
    )

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = ours.apply(variables, x, train=False)
    assert_close(got, want)


def test_resnet18_basicblock_parity():
    import jax

    from models.resnet import resnet18 as ref_resnet18

    from tamgcn_tpu.models.resnet import resnet18
    from tamgcn_tpu.utils.torch_import import import_resnet_state_dict

    torch.manual_seed(1)
    ref = ref_resnet18(pretrained=False, num_classes=7)
    ref.eval()
    ours = resnet18(num_classes=7)
    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    variables = import_resnet_state_dict(
        _state(ref), arch="resnet18", bottleneck=False, skip_fc=False
    )
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = ours.apply(variables, x, train=False)
    assert_close(got, want)


def test_block_dropout_active_in_train():
    import jax

    from tamgcn_tpu.models.resnet import resnet18

    ours = resnet18(num_classes=5, block_dropout=0.5)
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    v = ours.init(jax.random.PRNGKey(0), x, train=False)
    o_eval = ours.apply(v, x, train=False)
    o1 = ours.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                    mutable=["batch_stats"])[0]
    o2 = ours.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"])[0]
    assert not np.allclose(o1, o2)  # dropout active
    assert np.isfinite(np.asarray(o_eval)).all()


def test_fusion_model_parity(monkeypatch):
    import jax

    import models.resnet as ref_resnet_mod
    from models.resnet import resnet50 as ref_resnet50

    # offline: fake the pretrained download with a random state dict
    torch.manual_seed(2)
    fake_pretrained = ref_resnet50(pretrained=False).state_dict()
    monkeypatch.setattr(
        ref_resnet_mod, "load_state_dict_from_url",
        lambda *a, **k: fake_pretrained,
    )
    from models.resnet_gcn_attention import ResNet_GCN_Attention as RefFusion

    from tamgcn_tpu.models.resnet_gcn_attention import ResNetGCNAttention
    from tamgcn_tpu.utils.torch_import import import_fusion_state_dict

    torch.manual_seed(3)
    ref = RefFusion(
        num_class=10, num_point=20, num_person=1,
        graph="graph.ucla.Graph", graph_args={"labeling_mode": "spatial"},
        in_channels_gcn=3, in_channels_rgb=15, adaptive=True, freeze_gcn=True,
    )
    ref.eval()

    ours = ResNetGCNAttention(
        num_class=10, num_point=20, num_person=1,
        graph="ucla", graph_args={"labeling_mode": "spatial"},
        in_channels_gcn=3, in_channels_rgb=15, adaptive=True, freeze_gcn=True,
        use_pallas=False,
    )
    rs = np.random.RandomState(0)
    x_gcn = rs.randn(2, 3, 52, 20, 1).astype(np.float32)
    x_rgb = rs.randn(2, 15, 64, 64).astype(np.float32)
    init_vars = ours.init(jax.random.PRNGKey(0), x_gcn, x_rgb, train=False)
    variables = import_fusion_state_dict(_state(ref))
    assert jax.tree_util.tree_structure(init_vars) == jax.tree_util.tree_structure(
        variables
    ), "fusion variable tree mismatch"

    with torch.no_grad():
        want = ref(torch.from_numpy(x_gcn), torch.from_numpy(x_rgb)).numpy()
    got = ours.apply(variables, x_gcn, x_rgb, train=False)
    assert_close(got, want)
