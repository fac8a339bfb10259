"""Thalamus: sensory gating + Liquid-MoE cortical routing.

Parity with `Thalamus` (/root/reference/src/core/thalamus.py:16-100):
sigmoid sensory gate scaled by (1 + arousal) clamped to [0, 1]; pooled
signal routed by the LiquidMoE router with arousal-modulated temperature;
per-region dispatch = gated_input · region_gain.

TPU difference: the dispatch is dense-masked — every region gets a
[B, L, D] tensor whose gain is zero when unrouted (static shapes; the
reference builds a Python dict of only the selected regions).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.models.brain.liquid_moe import LiquidMoERouter


class Thalamus(nn.Module):
    d_model: int
    region_names: Tuple[str, ...]
    hidden_dim: int = 256
    top_k: int = 3

    @nn.compact
    def __call__(self, x: jax.Array,
                 limbic_state: Optional[Dict[str, jax.Array]] = None):
        """x: [B, L, D] → (routed {region: [B, L, D]}, routing probs [B, E])."""
        n_regions = len(self.region_names)
        gate = jax.nn.sigmoid(
            nn.Dense(self.d_model, name="sensory_gate")(x))
        if limbic_state is not None and "arousal" in limbic_state:
            arousal = limbic_state["arousal"]
            gate = jnp.clip(gate * (1.0 + arousal), 0.0, 1.0)
        gated = x * gate

        pooled = gated.mean(axis=1)                            # [B, D]
        attn_gain = None
        if limbic_state is not None:
            arousal = limbic_state.get("arousal", None)
            if arousal is not None:
                attn_gain = jnp.broadcast_to(
                    jnp.asarray(arousal, x.dtype), (x.shape[0],))[:, None]

        routing = LiquidMoERouter(
            self.hidden_dim, n_regions,
            top_k=min(self.top_k, n_regions), name="router")(
            pooled, attn_gain=attn_gain)

        # dense per-region gains: [B, E] from scattered top-k weights
        gains = jnp.zeros((x.shape[0], n_regions), x.dtype)
        gains = jax.vmap(
            lambda g, idx, w: g.at[idx].add(w))(
            gains, routing["indices"], routing["weights"].astype(x.dtype))

        routed = {
            name: gated * gains[:, i][:, None, None]
            for i, name in enumerate(self.region_names)
        }
        return routed, routing
