"""Spiking MoE language zones.

Parity map (SURVEY §2.2):
- `SNNExpert` ↔ snn_expert.py:8-60: stacked Synapsis+GIF ×2 → time-mean →
  linear readout;
- `FullLanguageZone` ↔ full_language_zone.py:12-90: prosody gains →
  prosody-modulated GIF encoder → rate bridge → LiquidMoE top-2 routing over
  N experts → Poisson bridge → GIF decoder → LayerNorm;
- `MoELanguageZone` ↔ moe_language_zone.py:18-127: standalone LM variant
  with embeddings + vocab head.

TPU-native dispatch: instead of the reference's Python loop with
`index_add_` combine (full_language_zone.py:61-75) or its dense run-all-
then-mask (moe_language_zone.py:99-105), ALL experts run as one batched
vmap over stacked expert params (an `[E, ...]` leading axis — the einsum
formulation the MXU likes), then combine with the routing weight matrix.
For top-k ≪ E at scale this becomes expert-parallel over the mesh 'model'
axis with masked dispatch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.models.layers import Synapsis
from aura_snn_rag_tpu.models.brain.liquid_moe import LiquidMoERouter
from aura_snn_rag_tpu.models.prosody import (
    prosody_attention_gains, prosody_gif_scan)
from aura_snn_rag_tpu.ops.neurons import gif_params, gif_scan
from aura_snn_rag_tpu.ops.spike_bridge import (
    continuous_to_spikes, spikes_to_continuous)


class SNNExpert(nn.Module):
    """Synapsis→GIF ×2 over time, mean-pooled, linear readout."""

    hidden_dim: int
    output_dim: int
    levels: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, T, D] spike/current input → [B, output_dim]."""
        gp = gif_params(levels=self.levels)
        h = Synapsis(self.hidden_dim, dtype=jnp.float32, name="syn1")(x)
        s1, _ = gif_scan(gp, h)
        h2 = Synapsis(self.hidden_dim, dtype=jnp.float32, name="syn2")(s1)
        s2, _ = gif_scan(gp, h2)
        pooled = s2.mean(axis=1)
        return nn.Dense(self.output_dim, name="readout")(pooled)


class ExpertBank(nn.Module):
    """E experts with stacked params, evaluated as one vmapped forward."""

    num_experts: int
    hidden_dim: int
    output_dim: int
    levels: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, T, D] → per-expert outputs [B, E, output_dim]."""
        expert = nn.vmap(
            SNNExpert,
            in_axes=None, out_axes=1,
            axis_size=self.num_experts,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(self.hidden_dim, self.output_dim, self.levels, name="experts")
        return expert(x)


class FullLanguageZone(nn.Module):
    """Prosody → GIF encode → MoE experts → Poisson → GIF decode → LN."""

    d_model: int
    num_experts: int = 8
    top_k: int = 2
    timesteps: int = 4
    levels: int = 8

    @nn.compact
    def __call__(self, token_ids: jax.Array, features: jax.Array,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, Any]]:
        """token_ids [B, T], features [B, T, D] → ([B, D], info)."""
        B, T, D = features.shape
        if rng is None:
            rng = jax.random.PRNGKey(0)

        # 1. prosody gains from token ids
        gains, pros_info = prosody_attention_gains(token_ids)

        # 2. prosody-modulated GIF encoder
        gp = gif_params(levels=self.levels)
        enc_in = nn.Dense(self.d_model, name="encoder_proj")(features)
        spikes, _ = prosody_gif_scan(gp, enc_in, gains)

        # 3. rate bridge → routing
        rates = spikes_to_continuous(spikes, "rate")          # [B, D]
        routing = LiquidMoERouter(
            hidden_dim=min(256, self.d_model), num_experts=self.num_experts,
            top_k=self.top_k, name="router")(rates)

        # 4. batched expert bank + sparse-weight combine
        expert_out = ExpertBank(self.num_experts, self.d_model,
                                self.d_model, self.levels,
                                name="bank")(spikes)          # [B, E, D]
        w = jnp.zeros((B, self.num_experts))
        w = jax.vmap(lambda wv, idx, val: wv.at[idx].add(val))(
            w, routing["indices"], routing["weights"])
        combined = jnp.einsum("be,bed->bd", w, expert_out)

        # 5. Poisson bridge → GIF decoder → LN
        dec_spikes = continuous_to_spikes(combined, self.timesteps, rng,
                                          "poisson")
        dec_in = nn.Dense(self.d_model, name="decoder_proj")(dec_spikes)
        dec_out, _ = gif_scan(gp, dec_in)
        out = nn.LayerNorm(name="output_norm")(
            spikes_to_continuous(dec_out, "rate"))
        return out, {"routing": routing, "prosody": pros_info,
                     "spike_rate": spikes.mean()}


class MoELanguageZone(nn.Module):
    """Standalone spiking-MoE language model: embed → zone → vocab head."""

    vocab_size: int
    d_model: int = 256
    num_experts: int = 8
    top_k: int = 2
    levels: int = 8

    @nn.compact
    def __call__(self, token_ids: jax.Array,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, Any]]:
        """token_ids [B, T] → (logits [B, vocab], info)."""
        embed = nn.Embed(self.vocab_size, self.d_model,
                         embedding_init=nn.initializers.normal(0.02),
                         name="embedding")
        features = embed(token_ids)                           # [B, T, D]
        zone_out, info = FullLanguageZone(
            self.d_model, self.num_experts, self.top_k,
            levels=self.levels, name="zone")(token_ids, features, rng)
        logits = nn.Dense(self.vocab_size, name="lm_head")(zone_out)
        return logits, info
