"""N-step training-dynamics equivalence vs the reference PyTorch stack.

Forward parity (tests/test_parity_torch.py) proves the models compute the
same function; this file proves the *training loops* produce the same
trajectory: identical initial weights + identical batch sequence through

  reference: torch SGD(momentum=0.9, nesterov, weight_decay), BN train mode
             (/root/reference/processor/recognition_rgb.py:21-28,48-69,
              models/ctrgcn.py BN momentum/init)
  ours:      the PRODUCTION fused/packed train step (train/packing.py
             make_fused_train_step + train/optim.make_optimizer)

must give allclose losses per step and allclose params + BN running stats
after the last step.

Both sides run in float64. In f32 this comparison is undecidable: the
cross-framework reduction-order noise (~1e-7 per op) reaches ~1e-2 on the
loss through 10 near-zero-scale BN blocks, and the SGD dynamics amplify it
chaotically — a real semantics bug (wrong BN momentum, biased-vs-unbiased
running variance, decay ordering, Nesterov form) is indistinguishable from
fp noise. In f64 the noise floor drops to ~1e-12 while any semantics bug
still shows at 1e-3+, so tight tolerances are decisive. torch `.double()`
widens the f32-initialised buffers exactly, and the importer/model keep f64
end-to-end (utils/torch_import.py, ops/norm.BatchNorm stat_dtype).

With no NW-UCLA dataset mounted, this is the strongest available proxy for
the 94.18%+-0.3 accuracy target (BASELINE.md): it catches
BN-momentum/unbiased-variance, decay-ordering, Nesterov and LR-schedule
bugs that forward parity cannot.
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

N_STEPS = 10
BATCH = 4
LR = 0.01
WD = 1e-4


@pytest.fixture(scope="module")
def x64():
    import jax

    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _batches(shape, n_class=10, seed=123):
    rs = np.random.RandomState(seed)
    return [
        (
            rs.randn(*shape).astype(np.float64),
            rs.randint(0, n_class, size=shape[0]).astype(np.int64),
        )
        for _ in range(N_STEPS)
    ]


def _torch_trajectory(model, batches):
    """Reference train loop: recognition_rgb.py:48-69 semantics."""
    model.train()
    opt = torch.optim.SGD(
        model.parameters(), lr=LR, momentum=0.9, nesterov=True, weight_decay=WD
    )
    ce = torch.nn.CrossEntropyLoss()
    losses = []
    for x, y in batches:
        out = model(torch.from_numpy(x))
        loss = ce(out, torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _jax_trajectory(ours, variables, batches):
    """Production path: fused packed step + flat-space optax chain."""
    import jax
    import jax.numpy as jnp
    import optax

    from tamgcn_tpu.train.optim import make_optimizer
    from tamgcn_tpu.train.packing import make_fused_train_step

    variables = jax.tree.map(jnp.asarray, variables)

    def loss_fn(params, batch_stats, inputs, label, dropout_rng):
        out, mutated = ours.apply(
            {"params": params, "batch_stats": batch_stats},
            *inputs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(out, label).mean()
        return loss, (out, mutated["batch_stats"])

    tx = make_optimizer(
        "SGD", LR, steps_per_epoch=10_000, step=(), lr_decay_rate=0.1,
        warm_up_epoch=0, nesterov=True, weight_decay=WD,
    )
    train_step, pstate, unravel_p, unravel_s = make_fused_train_step(
        loss_fn, tx, variables["params"], variables["batch_stats"]
    )
    train_step = jax.jit(train_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    losses = []
    for x, y in batches:
        pstate, loss, _acc = train_step(
            pstate, (jnp.asarray(x),), jnp.asarray(y.astype(np.int32)), rng
        )
        losses.append(float(loss))
    return losses, unravel_p(pstate.flat_params), unravel_s(pstate.flat_stats)


def _assert_tree_close(got, want, rtol, atol_frac, what):
    import jax

    flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_w = dict(
        ("/".join(str(k.key) for k in p), np.asarray(v))
        for p, v in jax.tree_util.tree_flatten_with_path(want)[0]
    )
    assert flat_w, f"{what}: empty reference tree"
    for path, leaf in flat_g:
        key = "/".join(str(k.key) for k in path)
        ref = flat_w[key]
        atol = max(float(np.abs(ref).max()), 1e-3) * atol_frac
        np.testing.assert_allclose(
            np.asarray(leaf), ref, rtol=rtol, atol=atol,
            err_msg=f"{what} diverged at {key} after {N_STEPS} steps",
        )


def _state_f64(model):
    return {
        k: v.detach().cpu().numpy().copy()
        for k, v in model.state_dict().items()
    }


def _run_equivalence(ref_model, ours, import_fn, input_shape):
    import jax

    ref_model.double()
    variables = import_fn(_state_f64(ref_model))
    batches = _batches((BATCH,) + input_shape)
    jax_losses, params, stats = _jax_trajectory(ours, variables, batches)
    torch_losses = _torch_trajectory(ref_model, batches)

    # f64 both sides: residual error is cross-framework reduction-order
    # noise (~1e-12) amplified by the SGD dynamics; a semantics bug (BN
    # momentum/bessel, decay ordering, Nesterov form) shows at 1e-3+
    np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=1e-9)
    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=1e-6,
        err_msg="loss trajectories diverged",
    )

    final = import_fn(_state_f64(ref_model))
    _assert_tree_close(params, final["params"], 1e-6, 1e-8, "params")
    _assert_tree_close(stats, final["batch_stats"], 1e-6, 1e-8, "batch_stats")
    # the BN running-variance check above is only meaningful if training
    # actually moved the stats away from init
    means = [
        np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(stats)[0]
        if str(p[-1].key) == "mean"
    ]
    assert any(float(np.abs(m).max()) > 1e-6 for m in means), (
        "BN running means never moved off init; the stats check is vacuous"
    )


def test_ctrgcn_train_equivalence(x64):
    from models.ctrgcn import Model as RefModel  # reference models/ctrgcn.py

    from tamgcn_tpu.models import create_ctrgcn_nucla
    from tamgcn_tpu.utils.torch_import import import_ctrgcn_state_dict

    torch.manual_seed(0)
    ref = RefModel(
        num_class=10, num_point=20, num_person=1,
        graph="graph.ucla.Graph", graph_args={"labeling_mode": "spatial"},
    )
    ours = create_ctrgcn_nucla(use_pallas=False)
    _run_equivalence(ref, ours, import_ctrgcn_state_dict, (3, 16, 20, 1))


def test_stgcn_train_equivalence(x64):
    from models.stgcn import Model as RefModel  # reference models/stgcn.py

    from tamgcn_tpu.models import create_stgcn_nucla
    from tamgcn_tpu.utils.torch_import import import_stgcn_state_dict

    torch.manual_seed(1)
    ref = RefModel(
        in_channels=3, num_class=10, num_point=20, num_person=1,
        graph="graph.ucla.Graph", graph_args={"labeling_mode": "spatial"},
    )
    ours = create_stgcn_nucla()
    _run_equivalence(ref, ours, import_stgcn_state_dict, (3, 16, 20, 1))
