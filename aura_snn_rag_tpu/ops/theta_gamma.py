"""Theta-gamma phase-coupled positional encoding.

Parity with `ThetaGammaPositionalEncoding`
(/root/reference/src/core/language_zone/theta_gamma_encoding.py:12-106):

- positions normalized to [0, 2π] by a FIXED `max_seq_len` (generation
  stability — encoding must not stretch during autoregressive decode),
- theta sin carrier plus gamma sin with phase-amplitude coupling
  (gamma amplitude = (cos θ + 1)/2),
- learnable per-dim phase offsets and amplitude modulation.

Pure elementwise math → XLA fuses it into the embedding sum; no kernel needed
(the reference's @torch.jit.script fusion is automatic here).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ThetaGammaParams(NamedTuple):
    theta_offsets: jax.Array   # [D]
    gamma_offsets: jax.Array   # [D]
    amplitude: jax.Array       # [D]


def init_theta_gamma(key: jax.Array, embedding_dim: int,
                     dtype=jnp.float32) -> ThetaGammaParams:
    k1, k2 = jax.random.split(key)
    return ThetaGammaParams(
        theta_offsets=(jax.random.normal(k1, (embedding_dim,)) * 0.1).astype(dtype),
        gamma_offsets=(jax.random.normal(k2, (embedding_dim,)) * 0.1).astype(dtype),
        amplitude=jnp.ones((embedding_dim,), dtype),
    )


def theta_gamma_encoding(params: ThetaGammaParams, positions: jax.Array,
                         max_seq_len: int, theta_freq: float = 8.0,
                         gamma_freq: float = 40.0) -> jax.Array:
    """Compute the encoding for integer `positions` [...,] → [..., D].

    Normalization denominator is max(max_seq_len - 1, 1), matching
    theta_gamma_encoding.py:81-83.
    """
    denom = float(max(max_seq_len - 1, 1))
    norm_pos = (positions.astype(params.amplitude.dtype) / denom) * (2.0 * math.pi)
    norm_pos = norm_pos[..., None]  # [..., 1]

    theta_phases = norm_pos + params.theta_offsets
    theta_enc = jnp.sin(theta_phases)

    freq_ratio = gamma_freq / theta_freq
    gamma_phases = norm_pos * freq_ratio + params.gamma_offsets

    # Phase-amplitude coupling: gamma amplitude rides the theta phase.
    gamma_amplitude = (jnp.cos(theta_phases) + 1.0) * 0.5
    gamma_enc = gamma_amplitude * jnp.sin(gamma_phases)

    return (theta_enc + 0.5 * gamma_enc) * params.amplitude
