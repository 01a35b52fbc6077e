"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on forced host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the build contract;
the real-TPU paths are exercised by bench.py / __graft_entry__.py.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
