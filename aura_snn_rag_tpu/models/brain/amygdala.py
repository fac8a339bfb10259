"""Amygdala: arousal/valence estimation from hidden features.

Parity with `Amygdala` (/root/reference/src/core/limbic_system.py:15-46):
2-layer MLP → tanh → (arousal ∈ [0,1], valence ∈ [-1,1]), batch-mean pooled.
TPU difference: returns device scalars (no `.item()` host syncs inside the
step — SURVEY §7.3 host-chatter fix); `build_prosody` composes the [B, L, 4]
prosody tensor on device (colab_l4_training.py:257-269 semantics:
channels = [arousal, valence, arousal, valence] broadcast over batch/seq).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Amygdala(nn.Module):
    d_model: int
    hidden: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        """x: [B, L, D] → device scalars {'arousal', 'valence'}."""
        pooled = x.mean(axis=1)                               # [B, D]
        h = nn.Dense(self.hidden, name="fc1")(pooled)
        h = nn.relu(h)
        sentiment = jnp.tanh(nn.Dense(2, name="fc2")(h))      # [B, 2]
        avg = sentiment.mean(axis=0)
        return {
            "arousal": (avg[0] + 1.0) / 2.0,                  # [0, 1]
            "valence": avg[1],                                # [-1, 1]
        }


def build_prosody(arousal: jax.Array, valence: jax.Array,
                  batch: int, seq_len: int, dtype=jnp.float32) -> jax.Array:
    """[B, L, 4] prosody tensor = [arousal, valence, arousal, valence]."""
    pros = jnp.stack([arousal, valence, arousal, valence]).astype(dtype)
    return jnp.broadcast_to(pros[None, None, :], (batch, seq_len, 4))
