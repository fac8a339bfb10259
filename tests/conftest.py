"""Test harness: force an 8-virtual-device CPU platform.

The reference has no multi-device tests (SURVEY.md §4.4); here every test runs
against a virtual 8-device CPU mesh so sharding paths are exercised without
TPU hardware.

NOTE: this environment preimports jax via sitecustomize with the axon (TPU)
backend pinned through JAX_PLATFORMS, so plain env vars are ignored; we must
override through jax.config BEFORE the first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("AURA_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    # separate compile cache per platform (shared cache entries trigger
    # noisy AOT machine-feature mismatch errors)
    os.environ.setdefault(
        "AURA_JAX_CACHE_DIR",
        os.path.expanduser("~/.cache/aura_jax_cache_cpu"))

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
