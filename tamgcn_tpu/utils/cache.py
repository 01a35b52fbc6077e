"""Persistent XLA compilation cache setup.

Full-model train-step compiles run minutes on this hardware (remote-compile
TPU tunnel); the persistent cache makes second runs near-instant. Called by
bench.py, main.py, and __graft_entry__ before any jit.
"""
from __future__ import annotations

import hashlib
import os
import platform


def _machine_key() -> str:
    """Discriminate cache entries by machine identity.

    XLA:CPU persists AOT-compiled results keyed only by the HLO; loading an
    entry compiled on a host with different CPU features logs
    "could lead to execution errors such as SIGILL" (cpu_aot_loader.cc, seen
    in MULTICHIP_r03.json). Keying the cache *path* on platform + CPU model
    keeps entries from crossing machine types.
    """
    bits = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                    break
    except OSError:
        bits.append(platform.processor())
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        # Under the axon remote-compile terminal, XLA:CPU computations are
        # AOT-compiled on the SERVICE machine with its CPU features; caching
        # them locally makes every warm run reload a feature-mismatched
        # binary (cpu_aot_loader.cc "could lead to execution errors such as
        # SIGILL" — seen in MULTICHIP_r03.json). No cache-path keying can
        # fix that (the mismatch is compile-machine vs execution-machine
        # within one process), so when the process targets the CPU backend
        # (the multi-chip dryrun) skip the persistent cache entirely — a
        # once-per-round fresh compile beats a latent SIGILL.
        #
        # Decide from JAX_PLATFORMS rather than jax.default_backend(): the
        # latter forces backend initialization at import time, which breaks
        # multi-host runs where jax.distributed.initialize() must run first
        # (trainer.py calls it after main.py's cache setup).
        platforms = os.environ.get("JAX_PLATFORMS", "")
        first = platforms.split(",")[0].strip().lower()
        if first == "cpu":
            return
    path = path or os.environ.get("TAMGCN_COMPILE_CACHE")
    if path is None:
        path = f"/tmp/tamgcn_jax_cache_{_machine_key()}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
