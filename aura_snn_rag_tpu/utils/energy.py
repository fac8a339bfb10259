"""Neuromorphic energy accounting (spike-count → picojoule proxy).

Parity with `benchmarks/bench_energy_tracking.py:33-…` (SURVEY §5.1): per-
component spike counts converted to energy estimates using published
neuromorphic-hardware costs (~pJ per synaptic event), contrasted with the
dense-MAC equivalent — the proxy metric the reference uses to argue SNN
efficiency on neuromorphic substrates.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# energy per operation (picojoules) — standard literature figures
PJ_PER_SPIKE_EVENT = 1.0      # neuromorphic synaptic event (~Loihi class)
PJ_PER_MAC_8BIT = 0.03        # 8-bit MAC, 7nm-class digital
PJ_PER_MAC_BF16 = 0.25        # bf16 MAC


class EnergyTracker:
    """Accumulates spike counts per component and estimates energy."""

    def __init__(self):
        self.spike_counts: Dict[str, float] = {}
        self.synapse_counts: Dict[str, int] = {}
        self.dense_macs: Dict[str, float] = {}

    def record(self, component: str, spikes: jax.Array,
               fan_out: int) -> None:
        """Record a spike tensor and its synaptic fan-out."""
        n = float(jnp.sum(spikes))
        self.spike_counts[component] = \
            self.spike_counts.get(component, 0.0) + n
        self.synapse_counts[component] = fan_out
        # dense equivalent: every element would be a MAC
        self.dense_macs[component] = (
            self.dense_macs.get(component, 0.0)
            + float(spikes.size) * fan_out)

    def energy_pj(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for comp, n_spikes in self.spike_counts.items():
            fan_out = self.synapse_counts.get(comp, 1)
            spike_pj = n_spikes * fan_out * PJ_PER_SPIKE_EVENT
            dense_pj = self.dense_macs.get(comp, 0.0) * PJ_PER_MAC_BF16
            out[comp] = {
                "spike_events": n_spikes * fan_out,
                "spiking_pj": spike_pj,
                "dense_pj": dense_pj,
                "efficiency_ratio": dense_pj / spike_pj if spike_pj else 0.0,
            }
        return out

    def summary(self) -> Dict[str, float]:
        e = self.energy_pj()
        return {
            "total_spiking_pj": sum(v["spiking_pj"] for v in e.values()),
            "total_dense_pj": sum(v["dense_pj"] for v in e.values()),
            "components": len(e),
        }
