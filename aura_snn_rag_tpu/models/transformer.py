"""HippocampalTransformer: the flagship LM (flax.linen).

Parity (SURVEY.md §3.2) with `HippocampalTransformer`
(/root/reference/src/core/language_zone/hippocampal_transformer.py:23-140)
and `SNNRAGTransformer` (snn_rag_transformer.py:20-245) — one module covers
both: `config.use_rag` selects `MemoryAugmentedLayer`s (retrieval +
injection per layer), `config.snn_layers` selects HybridFFN layers.

Differences by design (TPU-native):
- purely functional: the episodic `MemoryState` is an input; memory WRITES
  are not a side effect of forward — the model returns pooled summary
  features (`memory_summary`) and the training step performs the batched
  write (reference writes one memory per batch row from inside forward,
  hippocampal_transformer.py:124-138);
- `jax.checkpoint` rematerialization instead of torch.utils.checkpoint;
- KV-cache incremental decode support (the reference recomputes the full
  prefix every generated token, snn_rag_transformer.py:196-242).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.config import MemoryConfig, ModelConfig
from aura_snn_rag_tpu.memory.state import MemoryState
from aura_snn_rag_tpu.models.layers import (
    MemoryAugmentedLayer,
    PlaceCellEncoder,
    ThetaGammaPositional,
    TransformerLayer,
    _dtype,
)


class TransformerOutput(NamedTuple):
    logits: jax.Array            # [B, L, V]
    place_activity: jax.Array    # [B, L, n_place_cells]
    memory_summary: jax.Array    # [B, D] mean-pooled features for writes
    hidden: jax.Array            # [B, L, D] final hidden states


class HippocampalTransformer(nn.Module):
    config: ModelConfig
    memory_config: Optional[MemoryConfig] = None
    deterministic: bool = True
    # injectable retrieval for RAG layers (e.g. memory.sharded path)
    retrieve_fn: Optional[Any] = None
    # sequence-parallel routing: a mesh with a 'seq' axis > 1 makes every
    # attention core run as ring attention over it (set by
    # Trainer.shard_to_mesh from AuraConfig.parallel.seq_shards)
    mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 prosody: Optional[jax.Array] = None,
                 use_memory: bool = True,
                 memory_state: Optional[MemoryState] = None,
                 positions: Optional[jax.Array] = None,
                 kv_caches=None, cache_index=None
                 ) -> Tuple[TransformerOutput, Any]:
        cfg = self.config
        dt = _dtype(cfg)
        B, L = input_ids.shape

        encoder = PlaceCellEncoder(cfg, name="semantic_encoder")
        hidden, place_activity = encoder(input_ids)
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        hidden = hidden + ThetaGammaPositional(cfg, name="pos_encoder")(positions)
        hidden = nn.LayerNorm(dtype=dt, name="input_norm")(hidden)
        if cfg.dropout > 0:
            hidden = nn.Dropout(cfg.dropout)(
                hidden, deterministic=self.deterministic)

        new_caches = [] if kv_caches is not None else None
        # rematerialization must wrap the MODULE (nn.remat), not a closure
        # over it — raw jax.checkpoint around a compact submodule call lets
        # param-creation tracers escape the remat scope. static_argnums
        # count self as 0; `use_memory` is the only Python-bool arg.
        remat_on = cfg.use_gradient_checkpointing and kv_caches is None
        rag_cls = MemoryAugmentedLayer
        plain_cls = TransformerLayer
        if remat_on:
            # policy "dots": keep MXU outputs (QKV/FFN matmuls, attention),
            # recompute only VPU work (GIF scans, gates, norms) on backward
            # — cuts remat recompute FLOPs substantially vs full recompute.
            policy = (jax.checkpoint_policies
                      .dots_with_no_batch_dims_saveable
                      if cfg.gradient_checkpoint_policy == "dots" else None)
            rag_cls = nn.remat(MemoryAugmentedLayer, static_argnums=(4,),
                               policy=policy)
            plain_cls = nn.remat(TransformerLayer, static_argnums=(3,),
                                 policy=policy)
        for i in range(cfg.num_layers):
            use_snn = i in cfg.snn_layers
            cache_i = kv_caches[i] if kv_caches is not None else None
            if cfg.use_rag and self.memory_config is not None:
                layer = rag_cls(
                    cfg, self.memory_config, use_snn_ffn=use_snn,
                    deterministic=self.deterministic,
                    retrieve_fn=self.retrieve_fn, mesh=self.mesh,
                    name=f"layer_{i}")
                hidden, cache_out = layer(hidden, memory_state, prosody,
                                          use_memory, cache_i, cache_index)
            else:
                layer = plain_cls(
                    cfg, use_snn_ffn=use_snn,
                    deterministic=self.deterministic, mesh=self.mesh,
                    name=f"layer_{i}")
                hidden, cache_out = layer(hidden, prosody, use_memory,
                                          cache_i, cache_index)
            if new_caches is not None:
                new_caches.append(cache_out)

        hidden = nn.LayerNorm(dtype=dt, name="final_norm")(hidden)
        if cfg.tie_word_embeddings:
            logits = encoder.attend(hidden)
        else:
            logits = nn.Dense(cfg.vocab_size, dtype=dt, name="lm_head")(hidden)

        memory_summary = hidden.mean(axis=1).astype(jnp.float32)
        out = TransformerOutput(
            logits=logits.astype(jnp.float32),
            place_activity=place_activity,
            memory_summary=memory_summary,
            hidden=hidden,
        )
        return out, (tuple(new_caches) if new_caches is not None else None)

    def init_kv_caches(self, batch_size: int, max_len: int):
        """Allocate empty per-layer KV caches for incremental decode."""
        cfg = self.config
        dt = _dtype(cfg)
        shape = (batch_size, max_len, cfg.num_heads, cfg.head_dim)
        return tuple((jnp.zeros(shape, dt), jnp.zeros(shape, dt))
                     for _ in range(cfg.num_layers))
