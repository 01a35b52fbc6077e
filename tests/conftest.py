"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on forced host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the build contract;
the real-TPU paths are exercised by bench.py / __graft_entry__.py.
"""
import os

# Hard override: the ambient env sets JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run on host CPU with full fp32 matmuls for parity checking.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env is set)

# The axon sitecustomize (the TPU tunnel) overrides jax_platforms at import
# time in every interpreter; force it back to CPU after import.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the full CTRGCN takes minutes to compile on
# this 2-core CPU; cache makes reruns of the suite fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/tamgcn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
