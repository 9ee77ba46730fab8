"""Test harness: force an 8-device virtual CPU mesh.

The container's sitecustomize registers a remote TPU (axon) backend and
exports JAX_PLATFORMS=axon; tests must run on a local 8-device CPU mesh, so
both the env var and the already-imported jax config are overridden here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
