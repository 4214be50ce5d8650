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

import faulthandler  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


@pytest.hookimpl(wrapper=True)
def pytest_runtest_protocol(item):
    """Watchdog: a single test stuck for 15 min dumps every thread's stack
    and aborts, instead of hanging the suite forever.

    Why this exists (diagnosed round 3, previously 'suspected'): the Mosaic
    TPU interpreter runs io_callbacks on XLA execution threads that
    themselves dispatch jnp ops (shared_memory.update_clocks_for_device_
    barrier); if the main thread dispatches an EAGER jax op while such a
    callback is mid-dispatch, the two can deadlock on the runtime's
    internals (futex wait, 0% CPU, 21 threads). Interpret-mode tests now
    wrap their computation in ONE jit + block_until_ready so nothing
    overlaps the callbacks; this watchdog guards against any recurrence."""
    faulthandler.dump_traceback_later(timeout=900, exit=True)
    try:
        return (yield)
    finally:
        faulthandler.cancel_dump_traceback_later()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
