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

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "cpu_numerics: interpret-mode exact-equality vs a separately-jitted "
        "XLA reference — holds on the CPU backend only (on TPU the two "
        "programs fuse/round float32 dots differently, flipping bits that "
        "sit on demap decision boundaries); the compiled Mosaic lowering "
        "is verified on hardware by the axon smoke tests and bench A/Bs.",
    )


def pytest_collection_modifyitems(config, items):
    if _platform == "cpu":
        return
    skip = pytest.mark.skip(
        reason=f"cpu_numerics test skipped on platform={_platform} "
        "(see marker description; hardware equality is covered by the "
        "axon smoke tests + bench kernel-vs-XLA A/Bs)"
    )
    for item in items:
        if "cpu_numerics" in item.keywords:
            item.add_marker(skip)
