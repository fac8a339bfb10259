"""Test harness: force an 8-virtual-device CPU platform before JAX import.

The reference has no multi-device tests (SURVEY.md §4.4); here every test runs
against a virtual 8-device CPU mesh so sharding paths are exercised without
TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(42)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(42)
