"""Spike ↔ continuous bridges.

Parity with `/root/reference/src/core/language_zone/spike_bridge.py:4-70`:
- spike→continuous pooling over the time axis: 'rate' (mean),
  'temporal' (exponentially weighted, recent-heavy), 'phase' (FFT
  fundamental-phase features);
- continuous→spike: 'poisson' (rand < sigmoid(x)) and 'temporal'
  threshold coding (earlier steps fire for larger magnitudes).

Pure functions; PRNG is explicit (the reference uses global torch RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spikes_to_continuous(spikes: jax.Array, mode: str = "rate",
                         axis: int = -2) -> jax.Array:
    """[..., T, D] spikes → [..., D] continuous features."""
    T = spikes.shape[axis]
    if mode == "rate":
        return spikes.mean(axis=axis)
    if mode == "temporal":
        # exponential recency weighting, normalized
        w = jnp.exp(jnp.arange(T) / max(T - 1, 1))
        w = w / w.sum()
        shape = [1] * spikes.ndim
        shape[axis] = T
        return (spikes * w.reshape(shape)).sum(axis=axis)
    if mode == "phase":
        # phase of the fundamental frequency component along time
        fft = jnp.fft.rfft(spikes, axis=axis)
        fund = jnp.take(fft, 1, axis=axis) if fft.shape[axis] > 1 \
            else jnp.take(fft, 0, axis=axis)
        return jnp.angle(fund) / jnp.pi
    raise ValueError(f"unknown bridge mode {mode!r}")


def continuous_to_spikes(x: jax.Array, timesteps: int,
                         rng: jax.Array, mode: str = "poisson") -> jax.Array:
    """[..., D] continuous → [..., T, D] spikes."""
    if mode == "poisson":
        p = jax.nn.sigmoid(x)[..., None, :]
        u = jax.random.uniform(
            rng, x.shape[:-1] + (timesteps, x.shape[-1]))
        return (u < p).astype(x.dtype)
    if mode == "temporal":
        # threshold coding: larger |x| fires earlier; step t fires if
        # sigmoid(x) > (t+1)/(T+1)
        p = jax.nn.sigmoid(x)[..., None, :]
        thresholds = (jnp.arange(timesteps) + 1.0) / (timesteps + 1.0)
        shape = (1,) * (x.ndim - 1) + (timesteps, 1)
        return (p > thresholds.reshape(shape)).astype(x.dtype)
    raise ValueError(f"unknown bridge mode {mode!r}")
