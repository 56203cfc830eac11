"""Test config: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware and results are deterministic."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel),
# which makes per-call dispatch orders of magnitude slower for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and ignores the env
# var, so pin the platform via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
