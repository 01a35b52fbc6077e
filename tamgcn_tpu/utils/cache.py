"""Persistent XLA compilation cache setup.

Full-model train-step compiles run minutes on this hardware (remote-compile
TPU tunnel); the persistent cache makes second runs near-instant. Called by
bench.py, main.py, and __graft_entry__ before any jit.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "TAMGCN_COMPILE_CACHE", "/tmp/tamgcn_jax_cache"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
