"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: in this environment a sitecustomize preimports jax with a TPU backend, so setting
env vars here is too late for JAX_PLATFORMS; instead we update jax.config before the
first backend lookup. XLA_FLAGS is still read at CPU-client creation time, so forcing
the host device count here works as long as no jax computation ran yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process spawns etc.)")


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(0)
