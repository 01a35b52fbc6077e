"""Interpretability: gradient-based body-part importance + edge importance.

Capability parity with the analysis stage of reference
tools/train_stgcn_group.py:265-356 — |d score_true / d input| summed over
(C, T, M) per joint, averaged into 5 body-part groups, normalised to max 1
per class — and models/stgcn.py:227-252 (edge-importance per joint, exposed
via tamgcn_tpu.models.edge_importance_per_joint).

The gradient analysis is one jitted vmap-free grad call per batch; on TPU the
input-gradient comes for free from the same backward pass machinery as
training.
"""
from __future__ import annotations

import json
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# NW-UCLA 20-joint body-part groups (reference tools/train_stgcn_group.py:272-278)
NUCLA_TARGET_JOINTS: dict[str, list[int]] = {
    "head": [2, 3],
    "l_hand": [4, 5, 6, 7],
    "r_hand": [8, 9, 10, 11],
    "l_leg": [12, 13, 14, 15],
    "r_leg": [16, 17, 18, 19],
}

# NW-UCLA 10 action names (reference tools/train_stgcn_group.py:45-56)
LABEL_NAMES_10 = [
    "Pick up with one hand", "Pick up with two hands", "Drop trash",
    "Walk around", "Sit down", "Stand up", "Donning", "Doffing",
    "Throw", "Carry",
]


def make_input_grad_fn(model, variables):
    """Returns jitted fn(data, label) -> |grad| per joint, (B, V)."""

    def score_fn(data, label):
        out = model.apply(variables, data, train=False)
        return jnp.take_along_axis(out, label[:, None], axis=1).sum()

    grad_fn = jax.grad(score_fn)

    @jax.jit
    def joint_grads(data, label):
        g = grad_fn(data, label)  # (B, C, T, V, M)
        return jnp.abs(g).sum(axis=(1, 2, 4))  # (B, V)

    return joint_grads


def gradient_body_part_importance(
    model,
    variables,
    loader,
    num_class: int,
    target_joints: Mapping[str, Sequence[int]] = NUCLA_TARGET_JOINTS,
    samples_per_class: int = 200,
) -> dict[int, dict[str, float]]:
    """Per-class body-part importance, normalised to max 1 per class
    (reference tools/train_stgcn_group.py:283-349)."""
    joint_grads = make_input_grad_fn(model, variables)
    class_grads: dict[int, dict[str, list[float]]] = {
        g: {p: [] for p in target_joints} for g in range(num_class)
    }
    counts = {g: 0 for g in range(num_class)}
    for batch in loader:
        if all(c >= samples_per_class for c in counts.values()):
            break
        data, label = batch[0], np.asarray(batch[-2])
        grads = np.asarray(joint_grads(jnp.asarray(data), jnp.asarray(label)))
        for i, g in enumerate(label):
            g = int(g)
            if counts[g] >= samples_per_class:
                continue
            for part, joints in target_joints.items():
                class_grads[g][part].append(
                    float(np.mean([grads[i, j] for j in joints]))
                )
            counts[g] += 1

    final: dict[int, dict[str, float]] = {}
    for g in range(num_class):
        avg = {
            p: (float(np.mean(v)) if v else 0.0)
            for p, v in class_grads[g].items()
        }
        max_val = max(avg.values()) or 1.0
        final[g] = {p: v / max_val for p, v in avg.items()}
    return final


def save_weights_json(weights: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump({str(k): v for k, v in weights.items()}, f, indent=2)
