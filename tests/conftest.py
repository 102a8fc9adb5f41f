"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the idiomatic JAX way — with
``--xla_force_host_platform_device_count=8`` on the CPU backend — since
real multi-chip TPU hardware is not available in CI (SURVEY.md §4).
These env vars must be set before jax initialises its backends, hence
the top-of-conftest placement.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import time; the config
# update below wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
