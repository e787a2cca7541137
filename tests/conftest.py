"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/collective tests exercise a real Mesh without TPU hardware
(SURVEY.md §4 — the multi-host test layer the reference lacks)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU via the config API: the session environment pins
# JAX_PLATFORMS=axon (a TPU tunnel) and overriding the env var is not
# honored there — tests must run on local CPU with 8 virtual devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
