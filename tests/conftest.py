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
