"""Spiking layer primitives.

Parity with `/root/reference/src/base/snn_layers.py`:
- `SpikingLayer` (:67-180): Linear → dropout → vectorized LIF; firing-rate
  stats returned functionally (the reference mutates counters in-place);
- `AdaptiveSpikingLayer` (:182-235): + fixed lateral-inhibition matrix and
  homeostatic threshold adaptation toward a 10% target rate — the threshold
  is explicit state here (returned, not mutated);
- `ReservoirLayer` (:237-304): echo-state reservoir — sparse fixed recurrent
  weights rescaled to spectral radius 0.95, leaky tanh update over
  timesteps (a `lax.scan`), trainable linear readout;
- `make_layer` ↔ `BaseLayerFactory` (:306-418) by `neuron_type` string.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.ops.neurons import LIFParams, lif_scan


class SpikingLayer(nn.Module):
    features: int
    beta: float = 0.5
    threshold: float = 0.6
    init_slope: float = 15.0
    dropout: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array,
                 mem0: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """x: [B, T, D_in] currents → (spikes [B, T, features], stats)."""
        h = nn.Dense(self.features, name="linear")(x)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        params = LIFParams(
            beta=self.variable(
                "constants", "beta",
                lambda: jnp.full((self.features,), self.beta)).value,
            threshold=self.variable(
                "constants", "threshold",
                lambda: jnp.full((self.features,), self.threshold)).value,
            slope=self.param("slope",
                             nn.initializers.constant(self.init_slope),
                             (self.features,)),
        )
        spikes, mem = lif_scan(params, h, mem0)
        stats = {
            "firing_rate": spikes.mean(),
            "spike_count": spikes.sum(),
            "mem_mean": mem.mean(),
        }
        return spikes, stats


class AdaptiveSpikingLayer(nn.Module):
    features: int
    beta: float = 0.5
    threshold: float = 0.6
    init_slope: float = 15.0
    target_rate: float = 0.1
    inhibition_strength: float = 0.1
    adapt_rate: float = 0.01

    @nn.compact
    def __call__(self, x: jax.Array,
                 threshold_state: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
        """Returns (spikes, new_threshold_state, stats)."""
        h = nn.Dense(self.features, name="linear")(x)
        # fixed random lateral inhibition (non-learnable constant)
        inhib = self.variable(
            "constants", "lateral_inhibition",
            lambda: (jax.random.normal(jax.random.PRNGKey(0),
                                       (self.features, self.features))
                     * self.inhibition_strength
                     * (1 - jnp.eye(self.features)))).value
        if threshold_state is None:
            threshold_state = jnp.full((self.features,), self.threshold)

        params = LIFParams(
            beta=jnp.full((self.features,), self.beta),
            threshold=threshold_state,
            slope=self.param("slope",
                             nn.initializers.constant(self.init_slope),
                             (self.features,)),
        )
        spikes, _ = lif_scan(params, h)
        # lateral inhibition applied as a subtractive recurrent correction
        inhibited = spikes - jax.nn.relu(spikes @ inhib.T) * 0.1
        spikes = jnp.clip(inhibited, 0.0, 1.0)

        # homeostatic threshold adaptation toward target rate
        rate = spikes.mean(axis=tuple(range(spikes.ndim - 1)))
        new_threshold = threshold_state + self.adapt_rate * (
            rate - self.target_rate)
        new_threshold = jnp.clip(new_threshold, 0.1, 5.0)
        stats = {"firing_rate": spikes.mean(),
                 "threshold_mean": new_threshold.mean()}
        return spikes, new_threshold, stats


class ReservoirLayer(nn.Module):
    features: int
    spectral_radius: float = 0.95
    sparsity: float = 0.9
    leak: float = 0.3

    @nn.compact
    def __call__(self, x: jax.Array,
                 state0: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        """x: [B, T, D_in] → (readout [B, T, features], final state)."""

        def make_recurrent():
            key = jax.random.PRNGKey(1)
            k1, k2 = jax.random.split(key)
            W = jax.random.normal(k1, (self.features, self.features))
            keep = jax.random.uniform(k2, W.shape) > self.sparsity
            W = W * keep
            # rescale to the target spectral radius (power iteration)
            v = jnp.ones((self.features,)) / np.sqrt(self.features)
            for _ in range(20):
                v = W @ v
                v = v / (jnp.linalg.norm(v) + 1e-12)
            lam = jnp.abs(v @ (W @ v))
            return W * (self.spectral_radius / (lam + 1e-12))

        W_rec = self.variable("constants", "W_rec", make_recurrent).value
        W_in = nn.Dense(self.features, use_bias=False, name="input_proj")
        h_in = W_in(x)                                        # [B, T, F]

        if state0 is None:
            state0 = jnp.zeros(x.shape[:-2] + (self.features,))

        def step(state, inp):
            new = ((1 - self.leak) * state
                   + self.leak * jnp.tanh(inp + state @ W_rec.T))
            return new, new

        xs = jnp.moveaxis(h_in, -2, 0)
        final, states = jax.lax.scan(step, state0, xs)
        states = jnp.moveaxis(states, 0, -2)                  # [B, T, F]
        readout = nn.Dense(self.features, name="readout")(states)
        return readout, final


def make_layer(neuron_type: str, features: int, **kw):
    """Factory by type string ('spiking' | 'adaptive' | 'reservoir')."""
    types = {
        "spiking": SpikingLayer,
        "adaptive": AdaptiveSpikingLayer,
        "reservoir": ReservoirLayer,
    }
    if neuron_type not in types:
        raise ValueError(f"unknown neuron_type {neuron_type!r}; "
                         f"expected one of {sorted(types)}")
    return types[neuron_type](features=features, **kw)
