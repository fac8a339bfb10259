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


# ---------------------------------------------------------------------------
# Fast tier: `pytest -m fast` gates in ~3-4 min on the 1-CPU host, vs ~15 min
# for the full suite (which exceeds single-command timeouts in CI-like
# drivers). tests/_slow_tests.txt lists nodeids measured >= 5 s (call time,
# --durations=0 run); everything else is marked fast. A new test is fast by
# default until a durations run promotes it to the list.
# ---------------------------------------------------------------------------

def _load_slow_ids():
    import pathlib
    p = pathlib.Path(__file__).parent / "_slow_tests.txt"
    if not p.exists():
        return frozenset()
    return frozenset(line.strip() for line in p.read_text().splitlines()
                     if line.strip())


_SLOW_IDS = _load_slow_ids()


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)
        elif item.get_closest_marker("slow") is None:
            # an explicit @pytest.mark.slow opts out of the fast tier
            # without needing a durations run to list it
            item.add_marker(pytest.mark.fast)
