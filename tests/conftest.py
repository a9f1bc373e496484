"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

This image's sitecustomize imports jax at interpreter startup (registering
the axon TPU backend), so env vars alone are too late; jax backends are still
uninitialized here, so flipping the config works. Set AMT_TEST_PLATFORM
(e.g. "axon") to run the suite against real hardware instead.
"""

import os

_platform = os.environ.get("AMT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", _platform)
