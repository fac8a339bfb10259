"""Vectorized place/grid/time cell populations (the cognitive map).

Parity with `/root/reference/src/core/hippocampal.py`:
- place cells (:55-61, :140-150): random centers/radii; Gaussian rate
  `max_rate * exp(-d^2 / (2 sigma^2))` with sigma = radius/3, masked to the
  receptive radius;
- grid cells (:64-76, :152-172): log-spaced spacings, random
  orientation/phase, 3-plane-wave hexagonal interference
  (cos u1 + cos u2 + cos u3)/3 + 0.5, ReLU, assumes 2-D space;
- time cells (:79-82, :181-193): log-spaced preferred intervals with Gaussian
  temporal receptive fields over *logical* elapsed steps (the reference uses
  wall-clock; see SURVEY §2.11 determinism fix).

All pure functions over an explicit parameter pytree; they vmap over batch
locations (the reference handles a single global location).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.config import MemoryConfig


class CognitiveMapParams(NamedTuple):
    place_centers: jax.Array      # [Np, S]
    place_radii: jax.Array        # [Np, 1]
    grid_spacings: jax.Array      # [Ng, 1]
    grid_orientations: jax.Array  # [Ng, 1]
    grid_phases: jax.Array        # [Ng, S]
    time_intervals: jax.Array     # [Nt, 1]
    time_widths: jax.Array        # [Nt, 1]


def init_cognitive_map(key: jax.Array, config: MemoryConfig,
                       dtype=jnp.float32) -> CognitiveMapParams:
    kp, kr, ko, kf = jax.random.split(key, 4)
    S = config.spatial_dims
    spacings = jnp.logspace(0, 2, config.n_grid_cells, base=2.0,
                            dtype=dtype)[:, None]
    intervals = jnp.logspace(0, 3, config.n_time_cells, base=10.0,
                             dtype=dtype)[:, None]
    return CognitiveMapParams(
        place_centers=(jax.random.uniform(kp, (config.n_place_cells, S),
                                          dtype) * 20.0 - 10.0),
        place_radii=(jax.random.uniform(kr, (config.n_place_cells, 1),
                                        dtype) * 1.5 + 0.5),
        grid_spacings=spacings,
        grid_orientations=(jax.random.uniform(
            ko, (config.n_grid_cells, 1), dtype) * (math.pi / 3.0)),
        grid_phases=(jax.random.uniform(kf, (config.n_grid_cells, S),
                                        dtype) * spacings),
        time_intervals=intervals,
        time_widths=intervals * 0.3,
    )


def place_cell_rates(params: CognitiveMapParams, location: jax.Array,
                     max_rate: float = 20.0) -> jax.Array:
    """Gaussian place fields for `location` [..., S] → rates [..., Np]."""
    d = jnp.sqrt(jnp.sum(
        (location[..., None, :] - params.place_centers) ** 2, axis=-1) + 1e-12)
    sigma = params.place_radii[..., 0] / 3.0
    rates = max_rate * jnp.exp(-(d ** 2) / (2.0 * sigma ** 2))
    return rates * (d <= params.place_radii[..., 0]).astype(rates.dtype)


def grid_cell_rates(params: CognitiveMapParams, location: jax.Array,
                    max_rate: float = 25.0) -> jax.Array:
    """Hexagonal grid-cell interference for 2-D `location` [..., 2]."""
    k_const = 4.0 * math.pi / math.sqrt(3.0)
    x = location[..., None, 0:1]
    y = location[..., None, 1:2]
    cos_o = jnp.cos(params.grid_orientations)
    sin_o = jnp.sin(params.grid_orientations)
    rx = cos_o * x - sin_o * y
    ry = sin_o * x + cos_o * y
    sx = rx - params.grid_phases[..., 0:1]
    sy = ry - params.grid_phases[..., 1:2]
    k = k_const / params.grid_spacings
    u1 = k * sx
    u2 = k * (-0.5 * sx + 0.866 * sy)
    u3 = k * (-0.5 * sx - 0.866 * sy)
    val = (jnp.cos(u1) + jnp.cos(u2) + jnp.cos(u3)) / 3.0 + 0.5
    return max_rate * jax.nn.relu(val[..., 0])


def time_cell_rates(params: CognitiveMapParams, elapsed: jax.Array,
                    max_rate: float = 15.0) -> jax.Array:
    """Gaussian temporal receptive fields for elapsed time [...] → [..., Nt]."""
    diff = elapsed[..., None] - params.time_intervals[..., 0]
    w = params.time_widths[..., 0] / 3.0
    return max_rate * jnp.exp(-(diff ** 2) / (2.0 * w ** 2))
