"""Optimiser + LR schedule matching the reference's training recipe.

  * SGD with Nesterov momentum 0.9 and torch-style coupled weight decay
    applied to every parameter (reference processor/recognition_rgb.py:21-28);
  * step LR decay: lr = base_lr * decay^(#boundaries passed)
    (reference recognition_rgb.py:43-46);
  * optional linear warmup over the first warm_up_epoch epochs
    (reference tools/train_stgcn_group.py:186-191, config gcn.yaml:41);
  * Adam variant (reference recognition_rgb.py:29-33).

The schedule is expressed per optimisation step (epoch = step //
steps_per_epoch) so it lives inside the jitted update — no host-side
param-group mutation.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def make_lr_schedule(
    base_lr: float,
    decay_epochs: Sequence[int],
    decay_rate: float,
    steps_per_epoch: int,
    warm_up_epoch: int = 0,
):
    boundaries = jnp.asarray(sorted(decay_epochs), jnp.int32)

    def schedule(step):
        epoch = step // steps_per_epoch
        lr = base_lr * decay_rate ** jnp.sum(epoch >= boundaries)
        if warm_up_epoch > 0:
            warm = base_lr * (epoch + 1) / warm_up_epoch
            lr = jnp.where(epoch < warm_up_epoch, warm, lr)
        return lr

    return schedule


def make_optimizer(
    optimizer: str,
    base_lr: float,
    *,
    steps_per_epoch: int,
    step: Sequence[int] = (),
    lr_decay_rate: float = 0.1,
    warm_up_epoch: int = 0,
    nesterov: bool = True,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(
        base_lr, step, lr_decay_rate, steps_per_epoch, warm_up_epoch
    )
    if optimizer == "SGD":
        # torch SGD: grad += wd * param BEFORE the momentum buffer
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=0.9, nesterov=nesterov),
        )
    if optimizer == "Adam":
        # torch Adam weight_decay is also coupled (L2-into-grad)
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(schedule),
        )
    raise ValueError(f"unknown optimizer {optimizer!r}")
