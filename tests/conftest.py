"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware. Must run before jax initializes a backend."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container preloads jax (sitecustomize registers the axon TPU plugin),
# so the env var alone can be too late — force the platform via jax.config
# before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
