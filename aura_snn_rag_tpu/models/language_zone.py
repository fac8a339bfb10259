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


def topk_dispatch(indices: jax.Array, weights: jax.Array, num_experts: int,
                  capacity: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Capacity-based top-k dispatch plan (GShard/Switch-style, static shapes).

    indices/weights: [B, k] router picks. Returns
      dispatch [B, E, C] 0/1 — token b occupies slot c of expert e,
      combine  [B, E, C]     — dispatch × routing weight,
      dropped  []            — fraction of assignments beyond capacity.

    Tokens are ranked slot-major (token-major flatten), so earlier tokens
    win capacity ties — deterministic, order-stable.
    """
    B, k = indices.shape
    S = B * k
    flat_idx = indices.reshape(S)
    mask = jax.nn.one_hot(flat_idx, num_experts, dtype=jnp.float32)  # [S, E]
    pos = jnp.cumsum(mask, axis=0) - mask                  # rank within expert
    keep = mask * (pos < capacity)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                          dtype=jnp.float32)               # [S, E, C]
    disp_slots = keep[..., None] * slot
    comb_slots = disp_slots * weights.reshape(S)[:, None, None]
    dispatch = disp_slots.reshape(B, k, num_experts, capacity).sum(axis=1)
    combine = comb_slots.reshape(B, k, num_experts, capacity).sum(axis=1)
    dropped = 1.0 - keep.sum() / S
    return dispatch, combine, dropped


class ExpertBank(nn.Module):
    """E experts with stacked params, evaluated as one vmapped forward.

    Two dispatch modes:
    - dense (`__call__` with no routing): every expert sees every token —
      returns [B, E, output_dim] (the reference's dense-masked behavior,
      moe_language_zone.py:99-105, kept for small E / comparison).
    - sparse (`__call__` with routing): capacity-based top-k dispatch —
      experts only see tokens routed to them ([E, C, ...] batches), the
      true-EP fix for the dense-dispatch flaw VERDICT r1 #4 calls out.
      With the stacked [E, ...] params sharded over the mesh 'model' axis
      (parallel/mesh.py expert rule), GSPMD turns the dispatch/combine
      einsums into all_to_all over ICI.
    """

    num_experts: int
    hidden_dim: int
    output_dim: int
    levels: int = 8
    capacity_factor: float = 1.5

    def _vmapped_expert(self, in_axes, name="experts"):
        return nn.vmap(
            SNNExpert,
            in_axes=in_axes, out_axes=0 if in_axes == 0 else 1,
            axis_size=self.num_experts,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(self.hidden_dim, self.output_dim, self.levels, name=name)

    @nn.compact
    def __call__(self, x: jax.Array,
                 routing: Optional[Dict[str, jax.Array]] = None):
        """Dense: x [B, T, D] → [B, E, output_dim].
        Sparse: x [B, T, D] + routing{'indices','weights'} →
        (combined [B, output_dim], aux)."""
        if routing is None:
            return self._vmapped_expert(in_axes=None)(x)

        B, T, D = x.shape
        k = routing["indices"].shape[-1]
        capacity = max(1, int(self.capacity_factor * B * k
                              / self.num_experts))
        dispatch, combine, dropped = topk_dispatch(
            routing["indices"], routing["weights"], self.num_experts,
            capacity)
        # route tokens into per-expert capacity buckets: [E, C, T, D].
        # under EP sharding this einsum IS the all_to_all.
        expert_in = jnp.einsum("bec,btd->ectd", dispatch,
                               x.astype(jnp.float32))
        out_e = self._vmapped_expert(in_axes=0)(expert_in)   # [E, C, Do]
        y = jnp.einsum("bec,ecd->bd", combine, out_e)
        return y, {"dropped_fraction": dropped, "capacity": capacity}


class FullLanguageZone(nn.Module):
    """Prosody → GIF encode → MoE experts → Poisson → GIF decode → LN."""

    d_model: int
    num_experts: int = 8
    top_k: int = 2
    timesteps: int = 4
    levels: int = 8
    # True expert-parallel top-k dispatch by default; dense_dispatch=True
    # restores run-all-experts-and-mask (the reference's behavior) for
    # routing-quality comparisons.
    dense_dispatch: bool = False
    capacity_factor: float = 2.0

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

        # 4. expert bank: true top-k dispatch (or dense for comparison)
        bank = ExpertBank(self.num_experts, self.d_model, self.d_model,
                          self.levels, capacity_factor=self.capacity_factor,
                          name="bank")
        moe_aux: Dict[str, Any] = {}
        if self.dense_dispatch:
            expert_out = bank(spikes)                         # [B, E, D]
            w = jnp.zeros((B, self.num_experts))
            w = jax.vmap(lambda wv, idx, val: wv.at[idx].add(val))(
                w, routing["indices"], routing["weights"])
            combined = jnp.einsum("be,bed->bd", w, expert_out)
        else:
            combined, moe_aux = bank(spikes, routing)         # [B, D]

        # 5. Poisson bridge → GIF decoder → LN
        dec_spikes = continuous_to_spikes(combined, self.timesteps, rng,
                                          "poisson")
        dec_in = nn.Dense(self.d_model, name="decoder_proj")(dec_spikes)
        dec_out, _ = gif_scan(gp, dec_in)
        out = nn.LayerNorm(name="output_norm")(
            spikes_to_continuous(dec_out, "rate"))
        return out, {"routing": routing, "prosody": pros_info,
                     "spike_rate": spikes.mean(), **moe_aux}


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
