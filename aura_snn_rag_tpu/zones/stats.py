"""Neuromorphic telemetry: firing rates, gradient health, stability.

Parity with `BrainStats`/`StatsCollector`
(/root/reference/src/base/snn_brain_stats.py:15-496, SURVEY §5.1): per-zone
firing rates, surrogate-slope distribution, membrane stats, gradient-flow
health per layer, training-stability classification with history, JSON
save/load, recommendation heuristics.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BrainStats:
    zone_firing_rates: Dict[str, float] = field(default_factory=dict)
    slope_stats: Dict[str, float] = field(default_factory=dict)
    membrane_stats: Dict[str, float] = field(default_factory=dict)
    grad_health: Dict[str, float] = field(default_factory=dict)
    stability: str = "unknown"
    step: int = 0
    timestamp: float = field(default_factory=time.time)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "zone_firing_rates": self.zone_firing_rates,
            "slope_stats": self.slope_stats,
            "membrane_stats": self.membrane_stats,
            "grad_health": self.grad_health,
            "stability": self.stability,
            "step": self.step,
            "timestamp": self.timestamp,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BrainStats":
        return cls(**{k: d.get(k, v) for k, v in
                      cls().__dict__.items()})


class StatsCollector:
    """Accumulates BrainStats over training; classifies stability."""

    def __init__(self, history_len: int = 100):
        self.history: deque = deque(maxlen=history_len)
        self.current = BrainStats()

    # ------------------------------------------------------------------
    def update_firing_rates(self, rates: Dict[str, float]) -> None:
        self.current.zone_firing_rates.update(
            {k: float(v) for k, v in rates.items()})

    def update_from_params(self, params) -> None:
        """Extract surrogate-slope distribution stats from a param tree."""
        slopes = []

        def visit(path, leaf):
            if "slope" in "/".join(str(p) for p in path):
                slopes.append(np.asarray(leaf).ravel())
        jax.tree_util.tree_map_with_path(
            lambda p, l: visit(p, l), params)
        if slopes:
            s = np.concatenate(slopes)
            self.current.slope_stats = {
                "mean": float(s.mean()), "std": float(s.std()),
                "min": float(s.min()), "max": float(s.max()),
            }

    def update_grad_health(self, grads) -> None:
        """Per-top-level-module gradient norms + vanishing/exploding flags."""
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        by_layer: Dict[str, float] = {}
        for path, leaf in flat:
            key = str(path[0].key) if path and hasattr(path[0], "key") \
                else "root"
            if key == "params" and len(path) > 1:
                key = str(path[1].key) if hasattr(path[1], "key") else key
            g = float(jnp.sum(jnp.asarray(leaf, jnp.float32) ** 2))
            by_layer[key] = by_layer.get(key, 0.0) + g
        self.current.grad_health = {
            k: float(np.sqrt(v)) for k, v in by_layer.items()}

    def update_membrane(self, mems: Dict[str, jax.Array]) -> None:
        for name, m in mems.items():
            arr = np.asarray(m)
            self.current.membrane_stats[f"{name}_mean"] = float(arr.mean())
            self.current.membrane_stats[f"{name}_std"] = float(arr.std())

    # ------------------------------------------------------------------
    def classify_stability(self, recent_losses: List[float]) -> str:
        """'stable' | 'improving' | 'oscillating' | 'diverging'."""
        if len(recent_losses) < 4:
            label = "unknown"
        else:
            arr = np.asarray(recent_losses, np.float64)
            if not np.all(np.isfinite(arr)):
                label = "diverging"
            else:
                half = len(arr) // 2
                delta = arr[half:].mean() - arr[:half].mean()
                rel_std = arr.std() / (abs(arr.mean()) + 1e-9)
                if delta > 0.1 * abs(arr[:half].mean()):
                    label = "diverging"
                elif rel_std > 0.5:
                    label = "oscillating"
                elif delta < -1e-4:
                    label = "improving"
                else:
                    label = "stable"
        self.current.stability = label
        return label

    def commit(self, step: int) -> BrainStats:
        self.current.step = step
        self.current.timestamp = time.time()
        snapshot = BrainStats.from_dict(self.current.to_dict())
        self.history.append(snapshot)
        self.current = BrainStats()
        return snapshot

    # ------------------------------------------------------------------
    def get_recommendations(self) -> List[str]:
        recs = []
        if not self.history:
            return recs
        last = self.history[-1]
        for zone, rate in last.zone_firing_rates.items():
            if rate < 0.01:
                recs.append(f"zone '{zone}' nearly silent "
                            f"(rate {rate:.3f}) — lower thresholds or "
                            "raise input gain")
            elif rate > 0.5:
                recs.append(f"zone '{zone}' saturated (rate {rate:.3f}) — "
                            "raise thresholds / add inhibition")
        for layer, g in last.grad_health.items():
            if g < 1e-7:
                recs.append(f"vanishing gradients in '{layer}'")
            elif g > 1e3:
                recs.append(f"exploding gradients in '{layer}' — clip or "
                            "lower LR")
        if last.stability == "diverging":
            recs.append("training diverging — reduce LR / check data")
        elif last.stability == "oscillating":
            recs.append("loss oscillating — reduce LR or increase batch")
        return recs

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump([s.to_dict() for s in self.history], f)

    def load(self, path: str) -> None:
        if not os.path.exists(path):
            return
        with open(path) as f:
            self.history = deque(
                [BrainStats.from_dict(d) for d in json.load(f)],
                maxlen=self.history.maxlen)
