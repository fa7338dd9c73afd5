import os

# The session env pins JAX_PLATFORMS=axon (one real TPU chip via the axon
# PJRT plugin, registered in sitecustomize which also force-updates
# jax_platforms programmatically). The test suite must run hermetically on an
# 8-device virtual CPU mesh, so (1) set XLA_FLAGS before any backend
# initializes and (2) override the jax_platforms config AFTER importing jax —
# env vars alone are not enough because the plugin's register() calls
# jax.config.update("jax_platforms", "axon,cpu").
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("COSY_TEST_PLATFORM", "cpu"))
