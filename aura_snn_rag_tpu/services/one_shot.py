"""One-shot memorization helpers.

Parity with `one_shot_memorize_text` (/root/reference/colab_l4_training.py:
209-222), `one_shot_memorize_and_generate` (:225-254),
`store_custom_memory`/`retrieve_custom_memories` (:187-206): write a text's
model-embedding summary into episodic memory, then generate with memory
conditioning on.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.memory.hippocampus import HippocampalFormation


def embed_with_model(model, params, token_ids: jax.Array) -> jax.Array:
    """Mean-pooled final hidden state [B, D] (the model's memory summary)."""
    out, _ = model.apply(params, jnp.asarray(token_ids), use_memory=False)
    return out.memory_summary


def store_custom_memory(hippocampus: HippocampalFormation, memory_id: str,
                        features) -> None:
    hippocampus.write_batch([memory_id], np.asarray(features)[None, :])


def retrieve_custom_memories(hippocampus: HippocampalFormation,
                             query_features, k: int = 5
                             ) -> List[Tuple[str, float]]:
    return hippocampus.retrieve_similar_memories(
        np.asarray(query_features), k=k)


def one_shot_memorize_text(model, params,
                           hippocampus: HippocampalFormation,
                           token_ids, memory_id: Optional[str] = None
                           ) -> str:
    """Forward the text with store semantics: write its pooled summary."""
    ids = jnp.asarray(token_ids)
    if ids.ndim == 1:
        ids = ids[None, :]
    summary = embed_with_model(model, params, ids)
    mid = memory_id or "oneshot-" + hashlib.sha256(
        np.asarray(ids).tobytes()).hexdigest()[:12]
    hippocampus.write_batch([mid], np.asarray(summary[:1]))
    return mid


def one_shot_memorize_and_generate(model, params,
                                   hippocampus: HippocampalFormation,
                                   memorize_ids, prompt_ids,
                                   max_new_tokens: int = 32,
                                   rng: Optional[jax.Array] = None,
                                   **sample_kw):
    """Memorize support text, then generate from the prompt with
    `use_memory=True` so retrieval conditions the continuation."""
    from aura_snn_rag_tpu.generation import generate

    mid = one_shot_memorize_text(model, params, hippocampus, memorize_ids)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    prompt = jnp.asarray(prompt_ids)
    if prompt.ndim == 1:
        prompt = prompt[None, :]
    out = generate(model, params, prompt, max_new_tokens, rng,
                   memory_state=hippocampus.state, use_memory=True,
                   **sample_kw)
    return mid, out
