"""Orbax checkpoint/resume for train state pytrees.

Covers the reference's checkpoint capabilities (torchlight io.py:101-107
save_model, :57-90 load_weights incl. ignore-list filtering and partial-load
fallback; best-model policy in recognition_rgb.py:119-126) with
orbax-backed pytree checkpoints plus deterministic resume (step/epoch are part
of the saved state — the reference's manual --start_epoch + --weights resume
becomes automatic).
"""
from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, name: str, tree: Any, force: bool = True):
        path = os.path.join(self.directory, name)
        self._ckptr.save(path, tree, force=force)
        self._ckptr.wait_until_finished()

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure/shardings of `target`."""
        path = os.path.join(self.directory, name)
        return self._ckptr.restore(path, target=target)

    def exists(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.directory, name))

    def latest_epoch(self) -> int | None:
        best = None
        for entry in os.listdir(self.directory):
            m = re.fullmatch(r"epoch(\d+)", entry)
            if m:
                e = int(m.group(1))
                best = e if best is None else max(best, e)
        return best


def filter_ignore(tree: dict, ignore_keys: list[str]) -> dict:
    """Drop subtrees whose '/'-joined path contains any ignore key
    (reference torchlight io.py:68-77 --ignore_weights)."""
    if not ignore_keys:
        return tree
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out: dict = {}
    for path, leaf in flat:
        spath = "/".join(str(k.key) for k in path)
        if any(ig in spath for ig in ignore_keys):
            continue
        node = out
        keys = spath.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return out


def partial_update(target: dict, source: dict, log=print) -> dict:
    """Update target leaves present in source; report the diff
    (reference torchlight io.py:81-89 partial-load fallback)."""
    t_flat = dict(
        ("/".join(str(k.key) for k in p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(target)[0]
    )
    s_flat = dict(
        ("/".join(str(k.key) for k in p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(source)[0]
    )
    missing = sorted(set(t_flat) - set(s_flat))
    unexpected = sorted(set(s_flat) - set(t_flat))
    for k in missing:
        log(f"checkpoint missing weight: {k} (kept initialised value)")
    for k in unexpected:
        log(f"checkpoint has unexpected weight: {k} (ignored)")
    merged = {k: s_flat.get(k, v) for k, v in t_flat.items()}
    out: dict = {}
    for spath, leaf in merged.items():
        node = out
        keys = spath.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = np.asarray(leaf)
    return out
