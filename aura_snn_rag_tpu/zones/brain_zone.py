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
                          homeo_i: jax.Array, substeps: int = 32
                          ) -> Tuple[jax.Array, jax.Array]:
    """Run one neuron group over [B, T, D] currents (+ homeostatic bias).

    Biophysical models (Izhikevich/AdEx) integrate millisecond dynamics:
    each input timestep is held as DC drive for `substeps` integration
    steps (T·substeps·dt of simulated time), then spikes are pooled back
    to per-input-step counts. LIF is abstract-time and runs 1:1.

    Returns (spikes, final membrane potential [..., D]) — the membrane
    trace feeds the live telemetry the reference collects from module
    buffers (snn_brain_stats.py:241-276).
    """
    currents = currents + homeo_i
    if cfg.neuron_type in ("izhikevich", "adex"):
        T = currents.shape[-2]
        held = jnp.repeat(currents, substeps, axis=-2)
        if cfg.neuron_type == "izhikevich":
            p = izhikevich_params(cfg.izh_a, cfg.izh_b, cfg.izh_c,
                                  cfg.izh_d)
            spikes, (v, _) = izhikevich_scan(p, held * 15.0)  # mV drive
        else:
            spikes, (v, _) = adex_scan(adex_params(), held * 40.0)
        # pool substeps back to input resolution (counts per input step)
        shape = spikes.shape[:-2] + (T, substeps, spikes.shape[-1])
        return spikes.reshape(shape).sum(axis=-2), v
    p = lif_params(currents.shape[-1], cfg.beta, cfg.threshold)
    spikes, mem = lif_scan(p, currents)
    return spikes, mem


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
        mem_parts = []
        offset = 0
        for ncfg, size in zip(zc.neuron_configs, sizes):
            if size <= 0:
                continue
            cur = currents[..., offset:offset + size]
            hi = homeo_i[offset:offset + size]
            sp, mem = spiking_group_forward(ncfg, cur, hi)
            spikes_parts.append(sp)
            # normalize membrane scale across models so zone-level stats
            # are comparable (Izh/AdEx live in mV, LIF in unit scale)
            mem_parts.append(mem / (30.0 if ncfg.neuron_type
                                    in ("izhikevich", "adex") else 1.0))
            offset += size
        spikes = jnp.concatenate(spikes_parts, axis=-1)       # [B, T, N]
        rates = spikes.mean(axis=-2)                           # [B, N]
        mems = jnp.concatenate(mem_parts, axis=-1)             # [B, N]

        out = AdditionLinearModule(zc.output_dim, name="output_proj")(rates)
        out = out / max(1.0, zc.n_neurons)                     # L1-scale norm
        stats = {"avg_firing_rate": rates.mean(),
                 "spike_count": spikes.sum(),
                 "membrane_mean": mems.mean(),
                 "membrane_std": mems.std()}
        return out, stats


def zone_config_from_pattern(name: str, pattern: str, n_neurons: int = 128,
                             input_dim: int = 64, output_dim: int = 64,
                             timesteps: int = 4) -> BrainZoneConfig:
    """Zone config whose population uses a named Izhikevich firing pattern
    (brain_zone_factory.py parity: pattern-keyed zone builders)."""
    from aura_snn_rag_tpu.ops.izhikevich_presets import IZHIKEVICH_PRESETS
    p = IZHIKEVICH_PRESETS[pattern]
    return BrainZoneConfig(
        name=name, n_neurons=n_neurons, input_dim=input_dim,
        output_dim=output_dim, timesteps=timesteps,
        neuron_configs=(SpikingNeuronConfig(
            "izhikevich", izh_a=p["a"], izh_b=p["b"], izh_c=p["c"],
            izh_d=p["d"]),))


def create_cerebellum(n_neurons: int = 128, input_dim: int = 64,
                      output_dim: int = 64) -> BrainZoneConfig:
    """Cerebellum zone: fast-spiking granule-like population
    (brain_zone_factory.py `create_cerebellum` parity)."""
    return zone_config_from_pattern(
        "cerebellum", "fast_spiking", n_neurons, input_dim, output_dim)


class CorticalRegion(nn.Module):
    """Zone + output LayerNorm wrapper (cortical_region.py:24-27)."""

    config: BrainZoneConfig

    @nn.compact
    def __call__(self, x: jax.Array, homeo_i=None):
        out, stats = NeuromorphicBrainZone(self.config, name="zone")(
            x, homeo_i)
        return nn.LayerNorm(name="output_norm")(out), stats
