"""Sharded training step: pjit over the (data, model) mesh.

This is the multi-chip training path: one jitted step whose inputs carry
NamedShardings —

  * batch P('data'): data parallelism; GSPMD inserts the gradient psum over
    ICI (the TPU-native replacement for DataParallel scatter/gather,
    reference processor/io.py:86-87);
  * selected wide parameters P(..., 'model'): tensor parallelism for the
    classifier head and fusion attention MLP;
  * optional P(..., 'seq') on the activation time axis: temporal-axis
    sequence parallelism — XLA partitions the dilated temporal convs with
    automatic halo exchange over ICI (the CP analog for this model family,
    SURVEY §5 long-context note).

Params not matched by a rule are replicated. The same step function runs on
1 chip (trivial mesh) and on pod slices; tests exercise it on the virtual
8-device CPU mesh.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SharedTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


# default TP rules: shard the classifier head's output features and the
# cross-modal attention MLP's hidden features over the 'model' axis
DEFAULT_TP_RULES: tuple[tuple[str, P], ...] = (
    (r".*/fc/kernel$", P(None, "model")),
    (r".*/fc/bias$", P("model")),
    (r".*/attention_transform_dense1/kernel$", P(None, "model")),
    (r".*/attention_transform_dense1/bias$", P("model")),
    (r".*/attention_transform_dense2/kernel$", P("model", None)),
)


def param_shardings(mesh: Mesh, params, rules: Sequence[tuple[str, P]] = ()):
    """PartitionSpec tree for params: first matching path-regex rule wins,
    default replicated."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(path, leaf):
        spath = "/" + "/".join(str(k.key) for k in path)
        for pat, spec in compiled:
            if pat.match(spath):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        flat[1], [spec_for(p, l) for p, l in flat[0]]
    )


def make_train_step(model, tx: optax.GradientTransformation) -> Callable:
    """Pure train step: fwd + CE loss + bwd + optimiser + BN stat update."""

    def train_step(state: SharedTrainState, data, label, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables, data, train=True,
                mutable=["batch_stats"], rngs={"dropout": dropout_rng},
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out, label
            ).mean()
            return loss, (out, mutated.get("batch_stats", state.batch_stats))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = (logits.argmax(-1) == label).mean()
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
            acc,
        )

    return train_step


def make_packed_train_step(model, tx: optax.GradientTransformation, state):
    """`make_train_step` with fused state buffers AND a flat-space optimiser.

    The TrainState pytree is ~1450 leaves; unpacked, the executable's I/O is
    ~2900 buffers and the optimiser compiles to several HLO ops per leaf —
    per-buffer/per-op runtime overhead dominates the step (train/packing.py).
    Returns (step, pstate0, unravel_params); jit `step` with
    donate_argnums=(0,). Packed state carries a single (replicated) sharding,
    so it composes with data parallelism but not with per-param
    tensor-parallel shardings — use `make_train_step` for TP.
    """
    from ..train.packing import make_fused_train_step

    def loss_fn(params, batch_stats, data, label, dropout_rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = model.apply(
            variables, data, train=True,
            mutable=["batch_stats"], rngs={"dropout": dropout_rng},
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(out, label).mean()
        return loss, (out, mutated.get("batch_stats", batch_stats))

    step, pstate0, unravel_params, _ = make_fused_train_step(
        loss_fn, tx, state.params, state.batch_stats
    )
    return step, pstate0, unravel_params


def init_sharded_state(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    example: jax.Array,
    rng: jax.Array,
    tp_rules: Sequence[tuple[str, P]] = DEFAULT_TP_RULES,
) -> SharedTrainState:
    """Initialise params/opt state directly with their target shardings."""
    with mesh:
        variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
            rng, example
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if mesh.size > 1:  # see mesh.shard_batch: skip GSPMD arrays at size 1
        p_shard = param_shardings(mesh, params, tp_rules)
        params = jax.device_put(params, p_shard)
        batch_stats = jax.device_put(
            batch_stats, param_shardings(mesh, batch_stats)
        )
    with mesh:
        opt_state = jax.jit(tx.init)(params)
    return SharedTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
