"""Neuromorphic brain zones: mixed-neuron populations behind one interface.

Parity with `/root/reference/src/base/snn_brain_zones.py`:
- `SpikingNeuronConfig`/`BrainZoneConfig` (:21-35);
- `EnhancedSpikingNeuron` (:37-82): one interface over LIF/Izhikevich/AdEx
  with a homeostatic bias current (`homeo_i`) — here explicit state;
- `NeuromorphicBrainZone` (:84-170): percentage-allocated neuron groups,
  AdditionLinear in/out projections (:134-135), returns
  (output, {'avg_firing_rate'});
- `CorticalRegion` ↔ cortical_region.py:15-53 (zone + output LayerNorm).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.ops.maths import AdditionLinearModule
from aura_snn_rag_tpu.ops.neurons import (
    adex_params, adex_scan, izhikevich_params, izhikevich_scan,
    lif_params, lif_scan,
)


@dataclass(frozen=True)
class SpikingNeuronConfig:
    neuron_type: str = "lif"          # 'lif' | 'izhikevich' | 'adex'
    percentage: float = 1.0
    beta: float = 0.5
    threshold: float = 0.6
    izh_a: float = 0.02
    izh_b: float = 0.2
    izh_c: float = -65.0
    izh_d: float = 6.0


@dataclass(frozen=True)
class BrainZoneConfig:
    name: str = "zone"
    n_neurons: int = 128
    input_dim: int = 64
    output_dim: int = 64
    neuron_configs: Tuple[SpikingNeuronConfig, ...] = (
        SpikingNeuronConfig(),)
    timesteps: int = 4


def spiking_group_forward(cfg: SpikingNeuronConfig, currents: jax.Array,
                          homeo_i: jax.Array) -> jax.Array:
    """Run one neuron group over [B, T, D] currents (+ homeostatic bias)."""
    currents = currents + homeo_i
    if cfg.neuron_type == "izhikevich":
        p = izhikevich_params(cfg.izh_a, cfg.izh_b, cfg.izh_c, cfg.izh_d)
        spikes, _ = izhikevich_scan(p, currents * 10.0)  # scale to mV regime
    elif cfg.neuron_type == "adex":
        spikes, _ = adex_scan(adex_params(), currents * 40.0)
    else:
        p = lif_params(currents.shape[-1], cfg.beta, cfg.threshold)
        spikes, _ = lif_scan(p, currents)
    return spikes


class NeuromorphicBrainZone(nn.Module):
    config: BrainZoneConfig

    @nn.compact
    def __call__(self, x: jax.Array,
                 homeo_i: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """x: [B, D_in] → (output [B, D_out], activity stats).

        The input is expanded to `timesteps` constant-current steps, split
        across neuron groups by their percentage allocation, and the
        time-averaged spike rates are projected out.
        """
        zc = self.config
        if homeo_i is None:
            homeo_i = jnp.zeros((zc.n_neurons,))

        currents = AdditionLinearModule(zc.n_neurons, name="input_proj")(x)
        # L1-distance outputs are uniformly negative (≈ -E|x-w|·D), which
        # would leave every neuron silent; standardize per sample so the
        # best-matching half of the population receives positive drive.
        mu = currents.mean(axis=-1, keepdims=True)
        sd = currents.std(axis=-1, keepdims=True) + 1e-6
        currents = jnp.tanh((currents - mu) / sd)
        currents = jnp.broadcast_to(
            currents[..., None, :],
            currents.shape[:-1] + (zc.timesteps, zc.n_neurons))

        # split neurons into percentage groups
        sizes = []
        total = 0
        for i, ncfg in enumerate(zc.neuron_configs):
            if i == len(zc.neuron_configs) - 1:
                sizes.append(zc.n_neurons - total)
            else:
                s = int(zc.n_neurons * ncfg.percentage)
                sizes.append(s)
                total += s

        spikes_parts = []
        offset = 0
        for ncfg, size in zip(zc.neuron_configs, sizes):
            if size <= 0:
                continue
            cur = currents[..., offset:offset + size]
            hi = homeo_i[offset:offset + size]
            spikes_parts.append(spiking_group_forward(ncfg, cur, hi))
            offset += size
        spikes = jnp.concatenate(spikes_parts, axis=-1)       # [B, T, N]
        rates = spikes.mean(axis=-2)                           # [B, N]

        out = AdditionLinearModule(zc.output_dim, name="output_proj")(rates)
        out = out / max(1.0, zc.n_neurons)                     # L1-scale norm
        stats = {"avg_firing_rate": rates.mean(),
                 "spike_count": spikes.sum()}
        return out, stats


class CorticalRegion(nn.Module):
    """Zone + output LayerNorm wrapper (cortical_region.py:24-27)."""

    config: BrainZoneConfig

    @nn.compact
    def __call__(self, x: jax.Array, homeo_i=None):
        out, stats = NeuromorphicBrainZone(self.config, name="zone")(
            x, homeo_i)
        return nn.LayerNorm(name="output_norm")(out), stats
