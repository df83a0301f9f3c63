"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests exercise a real Mesh without TPU hardware."""
import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize pins JAX_PLATFORMS=axon (real TPU tunnel);
# tests must run on the virtual 8-device CPU backend, so override via config
# (env vars alone are ignored once the axon plugin registers).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated on this
# 1-core host; repeat runs reuse compiled programs across processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpupose_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
