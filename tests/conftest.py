"""Test configuration: run everything on a virtual 8-device CPU mesh.

The session environment pins JAX_PLATFORMS=axon (one real TPU chip) and
preloads jax at interpreter startup, so plain env-var overrides are too late;
`jax.config.update` before first backend use is the reliable path. Tests need
CPU for (a) 8 virtual devices to exercise the pjit mesh and (b) exact f32
matmuls for parity tolerances.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Host-count flag must reach XLA before the CPU client exists; config update
# of XLA_FLAGS above handles the subprocess case, and the client is created
# lazily at first use (no jax op has run yet at conftest import time).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    yield
