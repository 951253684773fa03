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

# Persistent XLA compilation cache: the suite's wall-clock is dominated
# by CPU compiles of large programs (shard_map grads, scan epochs) that
# are identical run to run; caching them keeps the inner loop inside
# the ~3 min budget.  Keyed by HLO + compiler version, so stale entries
# cannot produce wrong numerics — at worst a miss.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("KPGNN_TEST_CACHE",
                                 "/tmp/kpgnn_test_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
