"""Test harness config: force a virtual 8-device CPU mesh.

Must run before any jax import, so it lives at conftest top level.  This is
the JAX-native fake backend for exercising shard_map/collectives without a
pod, per SURVEY.md §4.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
