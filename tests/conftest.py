"""Test harness config: force a virtual 8-device CPU mesh.

The session environment pre-imports JAX with JAX_PLATFORMS=axon (a single
TPU chip behind a tunnel) via sitecustomize, so mutating os.environ here is
too late — jax.config already captured the platform.  Override the live
config instead.  The 8 virtual CPU devices are the JAX-native fake backend
for exercising shard_map/collectives without a pod (SURVEY.md §4).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
