"""Fused (packed) train state + flat-space optimiser.

The training state of CTR-GCN is ~1450 small arrays (604 param leaves, 605
optimiser-momentum leaves, ~240 BN stats). Two distinct costs follow from
keeping that structure inside the hot train step:

  1. the executable's I/O is ~2900 buffers, each with per-buffer dispatch
     overhead (negligible locally, ~10-20 us each through a remote/tunneled
     device);
  2. the optimiser update compiles to per-leaf HLO ops — with a schedule or
     weight decay in the chain XLA emits several ops + async copies PER LEAF,
     and at ~20-40 us of fixed per-op cost on the TPU runtime that is 77 ms
     of pure overhead per step (measured: full SGD chain 80 ms/step vs
     2.8 ms for constant-lr SGD on the same model, batch 64).

Both are solved the same way production trainers solve them — fused
buffers:

  * `make_packed_step` moves the jit boundary to a single flat buffer
    (fixes 1);
  * `make_fused_train_step` additionally runs the OPTIMISER in flat space:
    gradients are ravelled once inside the step and the optax transformation
    is applied to the single flat leaf, so momentum/decay/schedule become a
    handful of megabuffer-sized fused ops instead of 604 small ones (fixes
    2). optax transformations are elementwise over leaves, so single-leaf
    flat updates are bit-identical to per-leaf updates; frozen-submodule
    masking becomes a flat 0/1 mask (`freeze_mask_for`).

Note mixed dtypes in the state are promoted by ravel_pytree and cast back on
unravel — exact for f32 leaves and for int32 counters below 2^24 (our `step`),
which `pack_state` asserts.

The packed representation is replication-friendly (the flat buffer carries a
single sharding), so it composes with data parallelism; for tensor-parallel
param shardings keep the unpacked pytree step (parallel/sharded.py).

The reference framework has no equivalent (single-process PyTorch mutates
parameters in place); this is infrastructure the TPU execution model needs.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.flatten_util import ravel_pytree


_LANE_TILE = 1024  # one (8, 128) f32 vreg tile


def _ravel_padded(tree: Any) -> tuple[jax.Array, Callable, Callable]:
    """(padded_flat, pad_fn, unravel) — ravel and zero-pad to a vreg-tile
    multiple.

    An unpadded flat buffer of arbitrary length forces XLA to tile the
    elementwise optimizer/ravel work at whatever small factor the length
    happens to have: the 1,693,260-param CTRGCN buffer was reshaped to
    (564420, 3) — three of 128 lanes live, and ~1 ms/step of relayout.
    Padding to a multiple of 8*128 makes every flat op full-width and the
    reshapes bitcasts. The pad region carries zeros end-to-end (zero grads ->
    zero momentum -> zero updates for every elementwise optax chain).
    """
    flat, unravel = ravel_pytree(tree)
    n = flat.size
    pad = (-n) % _LANE_TILE

    def pad_fn(f: jax.Array) -> jax.Array:
        if pad:
            return jnp.concatenate([f, jnp.zeros((pad,), f.dtype)])
        return f

    def unravel_padded(f: jax.Array):
        return unravel(f[:n] if pad else f)

    return pad_fn(flat), pad_fn, unravel_padded


def pack_state(state: Any) -> tuple[jax.Array, Callable[[jax.Array], Any]]:
    """Flatten a state pytree into (flat_buffer, unravel_fn).

    Asserts the packing is value-exact: int leaves must fit f32 exactly if
    any float leaf forces promotion.
    """
    leaves = jax.tree_util.tree_leaves(state)
    dtypes = {jnp.asarray(l).dtype for l in leaves}
    float_dtypes = {d for d in dtypes if jnp.issubdtype(d, jnp.floating)}
    int_dtypes = dtypes - float_dtypes
    if float_dtypes and int_dtypes:
        for d in int_dtypes:
            if jnp.iinfo(d).bits > 32:
                raise ValueError(
                    f"cannot pack {d} losslessly alongside floats; keep it "
                    "out of the packed state"
                )
    flat, _, unravel = _ravel_padded(state)
    return flat, unravel


def make_packed_step(
    step_fn: Callable, state_template: Any
) -> tuple[Callable, jax.Array, Callable[[jax.Array], Any]]:
    """Wrap `step_fn(state, *args) -> (new_state, *aux)` to run on a packed state.

    Returns (packed_step, flat_state0, unravel):
      * `packed_step(flat_state, *args) -> (new_flat_state, *aux)` — jit this
        (donate argument 0: the buffer is updated in place);
      * `flat_state0` — the packed form of `state_template`;
      * `unravel(flat) -> state` — recover the pytree (for checkpointing,
        eval, export).
    """
    flat0, unravel = pack_state(state_template)

    def packed_step(flat_state, *args):
        state = unravel(flat_state)
        out = step_fn(state, *args)
        new_state, aux = out[0], out[1:]
        new_flat, _, _ = _ravel_padded(new_state)
        return (new_flat.astype(flat_state.dtype),) + tuple(aux)

    return packed_step, flat0, unravel


class PackedTrainState(struct.PyTreeNode):
    """Train state as fused buffers: params/BN-stats flat, optax state over
    the single flat-params leaf (so momentum etc. are flat buffers too)."""

    step: jax.Array
    flat_params: jax.Array
    flat_stats: jax.Array
    opt_state: Any


def freeze_mask_for(params: Any, prefixes: tuple[str, ...]) -> jax.Array | None:
    """Flat 0/1 mask over ravel_pytree(params) order: 0 where the param path
    starts with any of `prefixes` (frozen — no update, no weight decay; the
    functional equivalent of requires_grad=False, reference
    models/resnet_gcn_attention.py:24-26)."""
    if not prefixes:
        return None
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    parts = []
    for path, leaf in flat:
        spath = "/".join(str(k.key) for k in path)
        frozen = spath.startswith(tuple(prefixes))
        parts.append(np.full(np.size(leaf), 0.0 if frozen else 1.0, np.float32))
    return jnp.asarray(np.concatenate(parts) if parts else np.zeros((0,), np.float32))


def make_fused_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    params: Any,
    batch_stats: Any,
    freeze_mask: jax.Array | None = None,
):
    """Train step with fused state AND a flat-space optimiser.

    `loss_fn(params, batch_stats, inputs, label, dropout_rng) ->
    (loss, (logits, new_batch_stats))` supplies the model; `tx` is applied to
    the single flat-params leaf (bit-identical to per-leaf application for
    elementwise transformations — SGD/Nesterov/decay/schedules/Adam).

    Returns (train_step, pstate0, unravel_params, unravel_stats); jit
    `train_step` with donate_argnums=(0,). `train_step(pstate, inputs, label,
    rng) -> (pstate, loss, acc)`.
    """
    flat_p0, pad_p, unravel_params = _ravel_padded(params)
    flat_s0, pad_s, unravel_stats = _ravel_padded(batch_stats)
    if freeze_mask is not None and freeze_mask.size != flat_p0.size:
        # padded region: mask value irrelevant (its grads are zero); pad 0
        freeze_mask = jnp.concatenate([
            freeze_mask,
            jnp.zeros((flat_p0.size - freeze_mask.size,), freeze_mask.dtype),
        ])
    pstate0 = PackedTrainState(
        step=jnp.zeros((), jnp.int32),
        flat_params=flat_p0,
        flat_stats=flat_s0,
        opt_state=tx.init(flat_p0),
    )

    def train_step(pstate: PackedTrainState, inputs, label, rng):
        dropout_rng = jax.random.fold_in(rng, pstate.step)
        s = unravel_stats(pstate.flat_stats)

        # differentiate wrt the FLAT buffer: AD through unravel's slices
        # delivers the gradient already ravelled — no per-leaf grad tree ever
        # crosses an op boundary
        def flat_loss(flat_params):
            loss, aux = loss_fn(
                unravel_params(flat_params), s, inputs, label, dropout_rng
            )
            return loss, aux

        (loss, (logits, new_stats)), flat_grads = jax.value_and_grad(
            flat_loss, has_aux=True
        )(pstate.flat_params)
        updates, new_opt = tx.update(
            flat_grads, pstate.opt_state, pstate.flat_params
        )
        if freeze_mask is not None:
            updates = updates * freeze_mask
        new_flat_p = optax.apply_updates(pstate.flat_params, updates)
        acc = (logits.argmax(-1) == label).mean()
        new_pstate = pstate.replace(
            step=pstate.step + 1,
            flat_params=new_flat_p,
            flat_stats=pad_s(ravel_pytree(new_stats)[0]),
            opt_state=new_opt,
        )
        return new_pstate, loss, acc

    return train_step, pstate0, unravel_params, unravel_stats
