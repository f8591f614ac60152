"""Test configuration: force CPU JAX with an 8-device virtual mesh so
sharding tests run anywhere (the standard JAX trick for testing
N-device code without a pod)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The machine environment pins JAX_PLATFORMS=axon (single remote TPU)
# and a sitecustomize imports jax at interpreter boot, so the env var
# alone is too late — force the platform through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
