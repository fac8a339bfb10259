"""SNNRAGTransformer: the RAG + spiking-FFN flagship configuration.

API-parity front for `SNNRAGTransformer`
(/root/reference/src/core/language_zone/snn_rag_transformer.py:20-245):
the same architecture is `HippocampalTransformer` with `use_rag=True` and
SNN FFNs on even layers (snn_rag_transformer.py:51-54 default); `generate`
binds the KV-cached sampler with the reference's sampling defaults
(temperature/top-k/top-p/repetition penalty, :166-244).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from aura_snn_rag_tpu.config import MemoryConfig, ModelConfig
from aura_snn_rag_tpu.models.transformer import HippocampalTransformer


def snn_rag_config(base: ModelConfig,
                   snn_every: int = 2) -> ModelConfig:
    """RAG on + SNN FFN on even layers (reference default)."""
    return dataclasses.replace(
        base, use_rag=True,
        snn_layers=tuple(range(0, base.num_layers, snn_every)))


class SNNRAGTransformer(HippocampalTransformer):
    """HippocampalTransformer preset with retrieval-augmented layers."""

    @classmethod
    def create(cls, config: ModelConfig, memory_config: MemoryConfig,
               deterministic: bool = True) -> "SNNRAGTransformer":
        return cls(snn_rag_config(config), memory_config=memory_config,
                   deterministic=deterministic)

    def generate(self, params, input_ids, max_new_tokens: int,
                 rng: Optional[jax.Array] = None, memory_state=None,
                 temperature: float = 0.8, top_k: int = 50,
                 top_p: float = 0.9, repetition_penalty: float = 1.2,
                 eos_token_id: Optional[int] = None):
        """KV-cached sampling with the reference's decoding defaults."""
        from aura_snn_rag_tpu.generation import generate as _generate
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return _generate(
            self, params, input_ids, max_new_tokens, rng,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty,
            memory_state=memory_state,
            use_memory=memory_state is not None,
            eos_token_id=eos_token_id)
