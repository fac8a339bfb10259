"""NaturalBrain: the fully wired brain-simulation model.

Parity with `NaturalBrain` (/root/reference/src/core/natural_brain.py:19-120,
SURVEY §3.6): embed → limbic (arousal/valence) → thalamus routing (arousal +
hormone modulated) → per-region cortex (FullLanguageZone for temporal cortex,
NeuromorphicBrainZone regions otherwise; dopamine input scaling :87) → basal
ganglia integration → x + 0.1·out residual → vocab head. Hormone levels come
from the host-side EndocrineSystem (`update_homeostasis` parity).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.models.brain.basal_ganglia import BasalGanglia
from aura_snn_rag_tpu.models.brain.limbic import LimbicSystem
from aura_snn_rag_tpu.models.brain.thalamus import Thalamus
from aura_snn_rag_tpu.models.language_zone import FullLanguageZone
from aura_snn_rag_tpu.zones.brain_zone import (
    BrainZoneConfig, NeuromorphicBrainZone)

DEFAULT_REGIONS = ("temporal_cortex", "prefrontal_cortex",
                   "parietal_cortex")


class NaturalBrain(nn.Module):
    vocab_size: int
    d_model: int = 128
    regions: Tuple[str, ...] = DEFAULT_REGIONS
    num_experts: int = 4
    zone_neurons: int = 64

    @nn.compact
    def __call__(self, token_ids: jax.Array,
                 hormone_levels: Optional[Dict[str, float]] = None,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, Any]]:
        """token_ids [B, T] → (logits [B, vocab], info)."""
        hormones = hormone_levels or {}
        x = nn.Embed(self.vocab_size, self.d_model,
                     embedding_init=nn.initializers.normal(0.02),
                     name="embedding")(token_ids)             # [B, T, D]

        # 1. limbic assessment
        limbic = LimbicSystem(self.d_model, name="limbic")(x)
        arousal = limbic["emotional_state"]["arousal"]

        # 2. thalamic routing modulated by arousal + stress hormones
        arousal_eff = arousal + 0.1 * float(hormones.get("cortisol", 0.0)) \
            + 0.1 * float(hormones.get("norepinephrine", 0.0))
        routed, routing = Thalamus(
            self.d_model, self.regions, name="thalamus")(
            x, {"arousal": arousal_eff})

        # 3. cortical processing (dopamine scales drive: natural_brain.py:87)
        dopamine_scale = 1.0 + 0.1 * float(hormones.get("dopamine", 0.0))
        cortical: Dict[str, jax.Array] = {}
        info: Dict[str, Any] = {"routing": routing,
                                "emotion": limbic["emotional_state"]}
        for region in self.regions:
            signal = routed[region] * dopamine_scale
            if region == "temporal_cortex":
                out, zinfo = FullLanguageZone(
                    self.d_model, num_experts=self.num_experts,
                    name=f"cortex_{region}")(token_ids, signal, rng)
                info[f"{region}_info"] = {
                    "spike_rate": zinfo["spike_rate"]}
            else:
                zone_cfg = BrainZoneConfig(
                    name=region, n_neurons=self.zone_neurons,
                    input_dim=self.d_model, output_dim=self.d_model)
                out, zstats = NeuromorphicBrainZone(
                    zone_cfg, name=f"cortex_{region}")(
                    signal.mean(axis=1))
                info[f"{region}_info"] = zstats
            cortical[region] = out                              # [B, D]

        # 4. basal ganglia integration + residual + head
        integrated = BasalGanglia(self.d_model, self.regions,
                                  name="basal_ganglia")(cortical)
        pooled = x.mean(axis=1)
        final = pooled + 0.1 * (integrated if integrated is not None
                                else jnp.zeros_like(pooled))
        logits = nn.Dense(self.vocab_size, name="vocab_head")(final)
        return logits, info
