"""Test env: force CPU backend with 8 virtual devices so mesh/sharding
tests run without TPU hardware.

Note: the axon TPU harness overrides the JAX_PLATFORMS env var, so the
platform must be forced via jax.config after import; XLA_FLAGS still has to
be set before the first backend initialization.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
