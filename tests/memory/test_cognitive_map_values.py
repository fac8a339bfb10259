"""Value-level parity: cognitive-map math vs the reference formulas.

The reference computes these in torch (hippocampal.py:140-193); here the
same formulas are re-derived independently in numpy with pinned parameter
values and compared against the package functions element-by-element —
closing the PARITY_MAP "—" cells for grid/time-cell math.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory.cognitive_map import (
    CognitiveMapParams, grid_cell_rates, init_cognitive_map,
    place_cell_rates, time_cell_rates)


def _pinned_params():
    """Small, hand-pinned parameter set (no RNG) for exact value checks."""
    return CognitiveMapParams(
        place_centers=jnp.asarray([[0.0, 0.0], [3.0, 4.0], [-2.0, 1.0]]),
        place_radii=jnp.asarray([[1.5], [2.0], [0.9]]),
        grid_spacings=jnp.asarray([[1.0], [2.0], [4.0]]),
        grid_orientations=jnp.asarray([[0.0], [math.pi / 6.0], [0.4]]),
        grid_phases=jnp.asarray([[0.0, 0.0], [0.5, 0.25], [1.0, -1.0]]),
        time_intervals=jnp.asarray([[1.0], [10.0], [100.0]]),
        time_widths=jnp.asarray([[0.3], [3.0], [30.0]]),
    )


def test_place_cell_reference_values():
    """rate = 20 * exp(-d^2 / (2 (r/3)^2)), masked to d <= r
    (hippocampal.py:140-150)."""
    p = _pinned_params()
    loc = np.array([0.5, 0.5], np.float32)
    got = np.asarray(place_cell_rates(p, jnp.asarray(loc)))

    centers = np.asarray(p.place_centers)
    radii = np.asarray(p.place_radii)[:, 0]
    d = np.linalg.norm(loc - centers, axis=1)
    sigma = radii / 3.0
    want = 20.0 * np.exp(-(d ** 2) / (2 * sigma ** 2)) * (d <= radii)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # cell 0: d = sqrt(0.5) ~ 0.707 <= 1.5 -> active; cell 1: d = 4.30 > 2
    # -> hard-masked to 0 despite a nonzero Gaussian tail
    assert got[0] > 0.0 and got[1] == 0.0


def test_grid_cell_reference_values():
    """3-plane-wave interference, k = 4pi/(sqrt(3) spacing), val =
    (cos u1 + cos u2 + cos u3)/3 + 0.5, rate = 25 relu(val)
    (hippocampal.py:152-172 + k_const at :110)."""
    p = _pinned_params()
    loc = np.array([1.2, -0.7], np.float32)
    got = np.asarray(grid_cell_rates(p, jnp.asarray(loc)))

    k_const = 4.0 * math.pi / math.sqrt(3.0)
    want = []
    for i in range(3):
        o = float(np.asarray(p.grid_orientations)[i, 0])
        spacing = float(np.asarray(p.grid_spacings)[i, 0])
        px, py = np.asarray(p.grid_phases)[i]
        rx = math.cos(o) * loc[0] - math.sin(o) * loc[1]
        ry = math.sin(o) * loc[0] + math.cos(o) * loc[1]
        sx, sy = rx - px, ry - py
        k = k_const / spacing
        u1 = k * sx
        u2 = k * (-0.5 * sx + 0.866 * sy)
        u3 = k * (-0.5 * sx - 0.866 * sy)
        val = (math.cos(u1) + math.cos(u2) + math.cos(u3)) / 3.0 + 0.5
        want.append(25.0 * max(0.0, val))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


def test_grid_cell_at_phase_origin_is_max():
    """At the (rotated) phase origin all three waves are at cos(0)=1 ->
    val = 1.5, rate = 37.5 — the interference peak."""
    p = _pinned_params()
    # choose location whose rotation lands exactly on cell 0's phase (0,0)
    got = np.asarray(grid_cell_rates(p, jnp.asarray([0.0, 0.0])))
    np.testing.assert_allclose(got[0], 25.0 * 1.5, rtol=1e-6)


def test_time_cell_reference_values():
    """rate = 15 * exp(-(t - mu)^2 / (2 (w/3)^2)) (hippocampal.py:181-193):
    peak exactly at the preferred interval, symmetric falloff."""
    p = _pinned_params()
    got = np.asarray(time_cell_rates(p, jnp.asarray(10.0)))
    mu = np.asarray(p.time_intervals)[:, 0]
    w = np.asarray(p.time_widths)[:, 0] / 3.0
    want = 15.0 * np.exp(-((10.0 - mu) ** 2) / (2 * w ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(got[1], 15.0, rtol=1e-6)   # at preferred
    # symmetric receptive field around the preferred interval
    lo = np.asarray(time_cell_rates(p, jnp.asarray(8.0)))[1]
    hi = np.asarray(time_cell_rates(p, jnp.asarray(12.0)))[1]
    np.testing.assert_allclose(lo, hi, rtol=1e-5)


def test_init_matches_reference_distribution_ranges():
    """init draws match the reference's documented parameter ranges
    (hippocampal.py:55-82)."""
    cfg = MemoryConfig(max_memories=64, feature_dim=32, k_centroids=4,
                       n_place_cells=512, n_grid_cells=64, n_time_cells=32)
    p = init_cognitive_map(jax.random.PRNGKey(0), cfg)
    pc = np.asarray(p.place_centers)
    assert pc.min() >= -10.0 and pc.max() <= 10.0
    pr = np.asarray(p.place_radii)
    assert pr.min() >= 0.5 and pr.max() <= 2.0
    gs = np.asarray(p.grid_spacings)[:, 0]
    np.testing.assert_allclose(gs[0], 1.0, rtol=1e-5)     # 2^0
    np.testing.assert_allclose(gs[-1], 4.0, rtol=1e-5)    # 2^2
    go = np.asarray(p.grid_orientations)
    assert go.min() >= 0.0 and go.max() <= math.pi / 3.0
    ti = np.asarray(p.time_intervals)[:, 0]
    np.testing.assert_allclose(ti[0], 1.0, rtol=1e-5)     # 10^0
    np.testing.assert_allclose(ti[-1], 1000.0, rtol=1e-5)  # 10^3
    np.testing.assert_allclose(np.asarray(p.time_widths),
                               np.asarray(p.time_intervals) * 0.3)
