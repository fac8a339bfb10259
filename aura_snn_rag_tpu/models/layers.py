"""Transformer building blocks (flax.linen).

Parity map (behavior, not code — see SURVEY.md §2.2):
- `PlaceCellEncoder`        ↔ PlaceCellSemanticEncoder   place_cell_encoder.py:12-137
- `ThetaGammaPositional`    ↔ ThetaGammaPositionalEncoding theta_gamma_encoding.py:12-106
- `ProsodyGatedAttention`   ↔ HippocampalProsodyAttention hippocampal_attention.py:6-88
- `TransformerLayer`        ↔ HippocampalTransformerLayer hippocampal_layer.py:16-71
- `MLP`                     ↔ GELU FFN                    hippocampal_layer.py:66-69
- `SNNFFN` / `HybridFFN`    ↔ snn_ffn.py:16-146 (T=4 GIF timestep scan)
- `MemoryAugmentedLayer`    ↔ memory_augmented_layer.py:18-251 (RAG layer)

TPU idioms: bf16 compute / f32 params, `jax.nn.dot_product_attention` for the
causal core (XLA flash path), query gates fused as elementwise pre-matmul
scaling, GIF FFN via `lax.scan` + custom-VJP surrogate, batched device-side
memory retrieval (no per-batch-item host loop — fixes SURVEY §2.11).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.config import MemoryConfig, ModelConfig
from aura_snn_rag_tpu.memory import engine as memory_engine
from aura_snn_rag_tpu.memory.state import MemoryState
from aura_snn_rag_tpu.ops.neurons import gif_params, gif_scan, gif_scan_const
from aura_snn_rag_tpu.ops.place_cells import sparse_place_code
from aura_snn_rag_tpu.ops.theta_gamma import theta_gamma_encoding, ThetaGammaParams


def _dtype(config: ModelConfig):
    return jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32


class PlaceCellEncoder(nn.Module):
    """Token embedding with sparse place-cell population coding.

    setup-style so `attend` (tied output head) is a second callable method.
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dt = _dtype(cfg)
        self.token_embedding = nn.Embed(
            cfg.vocab_size, cfg.embedding_dim,
            embedding_init=nn.initializers.normal(0.02), dtype=dt)
        self.semantic_projection = nn.Dense(cfg.n_place_cells, dtype=dt)
        self.place_to_semantic = nn.Dense(cfg.embedding_dim, dtype=dt)

    def __call__(self, input_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        token_embeds = self.token_embedding(input_ids)        # [B, L, D]
        logits = self.semantic_projection(token_embeds)
        activity = sparse_place_code(logits.astype(jnp.float32), cfg.place_k)
        recon = self.place_to_semantic(activity.astype(token_embeds.dtype))
        out = token_embeds + cfg.place_residual_scale * recon
        return out, activity

    def attend(self, hidden: jax.Array) -> jax.Array:
        """Tied output head: hidden @ embedding^T (nn.Embed.attend)."""
        return self.token_embedding.attend(hidden)


class ThetaGammaPositional(nn.Module):
    """Learnable theta-gamma phase-coupled positional encoding."""

    config: ModelConfig

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        cfg = self.config
        params = ThetaGammaParams(
            theta_offsets=self.param(
                "theta_phase_offsets", nn.initializers.normal(0.1),
                (cfg.embedding_dim,)),
            gamma_offsets=self.param(
                "gamma_phase_offsets", nn.initializers.normal(0.1),
                (cfg.embedding_dim,)),
            amplitude=self.param(
                "amplitude_modulation", nn.initializers.ones,
                (cfg.embedding_dim,)),
        )
        enc = theta_gamma_encoding(params, positions, cfg.max_seq_len,
                                   cfg.theta_freq, cfg.gamma_freq)
        return enc.astype(_dtype(cfg))


class ProsodyGatedAttention(nn.Module):
    """Causal MHA with prosody/arousal/valence/memory query gates.

    Gates multiply the query pre-attention (hippocampal_attention.py:39-75):
      q *= (1 + sigmoid(W_p prosody))        per-head prosody gain
      q *= 1 + 0.2·tanh(arousal)             arousal boost
      q *= 1 + 0.05·tanh(valence)            valence gain
      q *= 1 + 0.5·sigmoid(W_m h)            memory gate
    """

    config: ModelConfig
    deterministic: bool = True
    # sequence-parallel routing: when `mesh` has a 'seq' axis of size > 1
    # the causal core runs as ring attention over it (exact blockwise
    # softmax, K/V rotating one ICI hop per step — parallel.ring_attention)
    # instead of a local dot_product_attention. Set by Trainer.shard_to_mesh
    # from AuraConfig.parallel.seq_shards; composes with TP (heads stay
    # sharded over 'model' inside the ring).
    mesh: Optional[Any] = None
    seq_axis_name: str = "seq"

    @nn.compact
    def __call__(self, hidden: jax.Array,
                 prosody: Optional[jax.Array] = None,
                 use_memory: bool = True,
                 kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
                 cache_index: Optional[jax.Array] = None):
        cfg = self.config
        dt = _dtype(cfg)
        B, L, D = hidden.shape
        H, Hd = cfg.num_heads, cfg.head_dim

        q = nn.Dense(D, dtype=dt, name="q_proj")(hidden)
        k = nn.Dense(D, dtype=dt, name="k_proj")(hidden)
        v = nn.Dense(D, dtype=dt, name="v_proj")(hidden)
        q = q.reshape(B, L, H, Hd)
        k = k.reshape(B, L, H, Hd)
        v = v.reshape(B, L, H, Hd)

        if prosody is not None:
            prosody = prosody.astype(dt)
            gain = jax.nn.sigmoid(
                nn.Dense(H, dtype=dt, name="prosody_gate")(prosody))
            arousal = prosody[..., 0:1]
            valence = prosody[..., 1:2]
            boost = ((1.0 + 0.2 * jnp.tanh(arousal))
                     * (1.0 + 0.05 * jnp.tanh(valence)))     # [B, L, 1]
            q = q * (1.0 + gain)[..., None] * boost[..., None]

        if use_memory:
            mem_w = jax.nn.sigmoid(
                nn.Dense(1, dtype=dt, name="memory_gate")(hidden))
            q = q * (1.0 + 0.5 * mem_w)[..., None]

        new_cache = None
        if kv_cache is not None:
            # incremental decode/prefill: append K/V rows at cache_index;
            # query position p = cache_index + offset attends keys [0, p]
            ck, cv = kv_cache
            idx = jnp.asarray(cache_index, jnp.int32)
            ck = jax.lax.dynamic_update_slice(ck, k, (0, idx, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, idx, 0, 0))
            new_cache = (ck, cv)
            T = ck.shape[1]
            qpos = idx + jnp.arange(L)                       # [L]
            mask = (jnp.arange(T)[None, :] <= qpos[:, None])  # [L, T]
            ctx = jax.nn.dot_product_attention(
                q, ck, cv, mask=mask[None, None, :, :])
        else:
            from aura_snn_rag_tpu.parallel.ring_attention import (
                mesh_seq_axis, sequence_sharded_attention)
            if mesh_seq_axis(self.mesh, self.seq_axis_name) > 1:
                mesh = self.mesh
                batch_axes = tuple(
                    a for a in mesh.axis_names
                    if a not in (self.seq_axis_name, "model", "stage"))
                head_axis = "model" if "model" in mesh.axis_names else None
                ctx = sequence_sharded_attention(
                    q, k, v, mesh, seq_axis=self.seq_axis_name,
                    batch_axes=batch_axes, head_axis=head_axis,
                    causal=True)
            else:
                ctx = jax.nn.dot_product_attention(q, k, v, is_causal=True)

        ctx = ctx.reshape(B, L, D)
        out = nn.Dense(D, dtype=dt, name="o_proj")(ctx)
        if cfg.dropout > 0:
            out = nn.Dropout(cfg.dropout)(
                out, deterministic=self.deterministic)
        return out, new_cache


class MLP(nn.Module):
    """Standard GELU MLP."""

    config: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dt = _dtype(cfg)
        h = nn.Dense(cfg.intermediate_size, dtype=dt, name="up")(x)
        h = nn.gelu(h)
        h = nn.Dense(cfg.embedding_dim, dtype=dt, name="down")(h)
        if cfg.dropout > 0:
            h = nn.Dropout(cfg.dropout)(h, deterministic=self.deterministic)
        return h


class Synapsis(nn.Module):
    """Spike-aware linear: init std = 1/sqrt(fan_in · firing_rate)
    (synapsis.py:78). Optional STDP eligibility traces (synapsis.py:110-198):
    pre/post activity EMAs returned as state; `stdp_update` computes the
    outer-product weight delta for an external (training-loop) update with
    the reference's ±10 clamp."""

    features: int
    target_firing_rate: float = 0.3
    dtype: Any = jnp.bfloat16
    enable_plasticity: bool = False
    trace_decay: float = 0.95

    @nn.compact
    def __call__(self, spikes: jax.Array,
                 trace_state: Optional[Tuple[jax.Array, jax.Array]] = None):
        fan_in = spikes.shape[-1]
        std = 1.0 / math.sqrt(fan_in * self.target_firing_rate)
        w = self.param("kernel", nn.initializers.normal(std),
                       (fan_in, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        out = (spikes.astype(self.dtype) @ w.astype(self.dtype)
               + b.astype(self.dtype))
        if not self.enable_plasticity:
            return out
        # trace update: EMA of mean pre-spikes / post-currents over time
        pre = spikes.mean(axis=-2)
        post = out.mean(axis=-2).astype(jnp.float32)
        if trace_state is None:
            pre_trace = jnp.zeros_like(pre)
            post_trace = jnp.zeros_like(post)
        else:
            pre_trace, post_trace = trace_state
        d = self.trace_decay
        new_state = (d * pre_trace + (1 - d) * pre,
                     d * post_trace + (1 - d) * post)
        return out, new_state

    @staticmethod
    def stdp_update(kernel: jax.Array, pre_trace: jax.Array,
                    post_trace: jax.Array, lr: float = 0.001) -> jax.Array:
        """ΔW = η·(pre ⊗ post), batch-averaged, clamped to ±10."""
        if pre_trace.ndim > 1:
            pre_trace = pre_trace.mean(axis=0)
            post_trace = post_trace.mean(axis=0)
        dw = lr * jnp.outer(pre_trace, post_trace)
        return jnp.clip(kernel + dw, -10.0, 10.0)


class SNNFFN(nn.Module):
    """Spiking FFN: expand each token to T timesteps, two Synapsis→GIF
    stages, mean over time (snn_ffn.py:55-86)."""

    config: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dt = _dtype(cfg)
        T = cfg.snn_timesteps
        B, L, D = x.shape
        # GIF dynamics run in the model compute dtype: the [B·L, T, 3072]
        # time-expanded tensors are the largest activations in the model
        # (f32 here = multi-GB per layer in the backward at B=32, L=512);
        # multi-bit spikes (levels ≤ 16) and theta adaptation tolerate
        # bf16 resolution (~2^-7 near 1.0)
        gp = gif_params(levels=cfg.snn_levels, dtype=dt)

        # The reference expands each token to T identical timestep currents
        # BEFORE the stage-1 linears (snn_ffn.py:69-70), recomputing
        # syn1/gif1_in T times on identical inputs. Running them once on
        # [B*L, D] and scanning the constant current is mathematically
        # identical and removes the T x redundant MXU work (the gif1_in
        # F x F matmul is the single largest matmul in the layer).
        xf = x.reshape(B * L, D)
        h1 = Synapsis(cfg.intermediate_size, dtype=dt, name="syn1")(xf)
        # GIF input projection (gif_neuron.py:31 linear) then dynamics
        h1 = nn.Dense(cfg.intermediate_size, dtype=dt, name="gif1_in")(h1)
        s1, _ = gif_scan_const(gp, h1.astype(dt), T)

        h2 = Synapsis(cfg.embedding_dim, dtype=dt, name="syn2")(s1)
        h2 = nn.Dense(cfg.embedding_dim, dtype=dt, name="gif2_in")(h2)
        s2, _ = gif_scan(gp, h2.astype(dt), unroll=True)

        out = s2.astype(jnp.float32).mean(axis=1).reshape(B, L, D).astype(dt)
        if cfg.dropout > 0:
            out = nn.Dropout(cfg.dropout)(out,
                                          deterministic=self.deterministic)
        return out


class HybridFFN(nn.Module):
    """Learnable sigmoid-gated blend of MLP and SNN paths (snn_ffn.py:128-145)."""

    config: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        mlp_out = MLP(cfg, self.deterministic, name="mlp")(x)
        snn_out = SNNFFN(cfg, self.deterministic, name="snn")(x)
        gate_logit = self.param(
            "gate", nn.initializers.constant(
                math.log(cfg.snn_ratio / (1 - cfg.snn_ratio))), ())
        g = jax.nn.sigmoid(gate_logit).astype(mlp_out.dtype)
        return (1.0 - g) * mlp_out + g * snn_out


class TransformerLayer(nn.Module):
    """Pre-norm block: LN→attn→residual; LN→FFN→residual."""

    config: ModelConfig
    use_snn_ffn: bool = False
    deterministic: bool = True
    mesh: Optional[Any] = None           # seq-parallel routing (see attention)

    @nn.compact
    def __call__(self, hidden: jax.Array,
                 prosody: Optional[jax.Array] = None,
                 use_memory: bool = True,
                 kv_cache=None, cache_index=None):
        cfg = self.config
        normed = nn.LayerNorm(dtype=_dtype(cfg), name="attention_norm")(hidden)
        attn_out, new_cache = ProsodyGatedAttention(
            cfg, self.deterministic, mesh=self.mesh, name="attention")(
            normed, prosody, use_memory, kv_cache, cache_index)
        hidden = hidden + attn_out

        normed = nn.LayerNorm(dtype=_dtype(cfg), name="ffn_norm")(hidden)
        if self.use_snn_ffn:
            ffn_out = HybridFFN(cfg, self.deterministic, name="ffn")(normed)
        else:
            ffn_out = MLP(cfg, self.deterministic, name="ffn")(normed)
        return hidden + ffn_out, new_cache


class MemoryAugmentedLayer(nn.Module):
    """RAG layer: self-attention, batched episodic retrieval + injection, FFN.

    Injection modes (memory_augmented_layer.py:155-203):
    - "cross_attention": hidden attends over the k retrieved memories;
    - "concat": score-softmax-weighted memory mean, `h + 0.1·ctx`;
    - "gate": sigmoid([h; ctx]) gated additive injection.
    Retrieval is one batched device call over the whole batch.
    """

    config: ModelConfig
    memory_config: MemoryConfig
    use_snn_ffn: bool = False
    deterministic: bool = True
    # injectable retrieval (e.g. the shard_map sharded-bank path);
    # signature: (memory_config, memory_state, queries, k) -> RetrievalResult
    retrieve_fn: Optional[Any] = None
    mesh: Optional[Any] = None           # seq-parallel routing (see attention)

    @nn.compact
    def __call__(self, hidden: jax.Array,
                 memory_state: Optional[MemoryState] = None,
                 prosody: Optional[jax.Array] = None,
                 use_memory: bool = True,
                 kv_cache=None, cache_index=None):
        cfg = self.config
        dt = _dtype(cfg)
        normed = nn.LayerNorm(dtype=dt, name="attention_norm")(hidden)
        attn_out, new_cache = ProsodyGatedAttention(
            cfg, self.deterministic, mesh=self.mesh, name="attention")(
            normed, prosody, use_memory, kv_cache, cache_index)
        hidden = hidden + attn_out

        if use_memory and memory_state is not None:
            query = nn.Dense(cfg.embedding_dim, dtype=dt, name="query_proj")(
                hidden.mean(axis=1))                          # [B, D]
            if self.retrieve_fn is not None:
                result = self.retrieve_fn(
                    self.memory_config, memory_state,
                    query.astype(jnp.float32), cfg.num_retrieved)
            else:
                result = memory_engine.retrieve_auto(
                    self.memory_config, memory_state,
                    query.astype(jnp.float32), None, cfg.num_retrieved)
            mem_feats = result.features.astype(dt)            # [B, K, D]
            mem_scores = result.scores.astype(dt)             # [B, K]

            mode = cfg.memory_injection
            if mode == "cross_attention":
                normed_m = nn.LayerNorm(dtype=dt, name="memory_norm")(hidden)
                ctx = nn.MultiHeadDotProductAttention(
                    num_heads=cfg.num_heads, dtype=dt,
                    name="memory_attention")(normed_m, mem_feats, mem_feats)
                hidden = hidden + ctx
            else:
                weights = jax.nn.softmax(mem_scores, axis=-1)[..., None]
                ctx = (mem_feats * weights).sum(axis=1, keepdims=True)
                ctx = jnp.broadcast_to(ctx, hidden.shape)
                if mode == "concat":
                    hidden = hidden + 0.1 * ctx
                else:  # "gate"
                    ctx = nn.Dense(cfg.embedding_dim, dtype=dt,
                                   name="memory_proj")(ctx)
                    gate = jax.nn.sigmoid(nn.Dense(
                        cfg.embedding_dim, dtype=dt, name="memory_gate_proj")(
                        jnp.concatenate([hidden, ctx], axis=-1)))
                    hidden = hidden + gate * ctx

        normed = nn.LayerNorm(dtype=dt, name="ffn_norm")(hidden)
        if self.use_snn_ffn:
            ffn_out = HybridFFN(cfg, self.deterministic, name="ffn")(normed)
        else:
            ffn_out = MLP(cfg, self.deterministic, name="ffn")(normed)
        return hidden + ffn_out, new_cache
