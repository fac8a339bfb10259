"""Emotion/intent/tone/personality multi-task head.

Parity with `EmotionPersonalityHead`/`EmotionPersonalityLoss`
(/root/reference/src/prosody/emotion_head.py:21-106): shared MLP trunk over
pooled features + four linear heads, weighted multi-task cross-entropy.
Trained standalone (scripts/train_emotion_head.py parity lives in
examples/train_emotion_head.py).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class EmotionHeadConfig(NamedTuple):
    d_model: int = 256
    trunk_dim: int = 128
    n_emotions: int = 8      # joy/sad/anger/fear/surprise/disgust/trust/neutral
    n_intents: int = 6       # inform/ask/command/express/social/other
    n_tones: int = 4         # formal/casual/urgent/calm
    n_personality: int = 5   # big-five dominant trait
    dropout: float = 0.1


class EmotionPersonalityHead(nn.Module):
    config: EmotionHeadConfig = EmotionHeadConfig()
    deterministic: bool = True

    @nn.compact
    def __call__(self, features: jax.Array) -> Dict[str, jax.Array]:
        """features: [B, D] pooled text features → per-task logits."""
        cfg = self.config
        h = nn.Dense(cfg.trunk_dim, name="trunk1")(features)
        h = nn.relu(h)
        if cfg.dropout > 0:
            h = nn.Dropout(cfg.dropout)(h, deterministic=self.deterministic)
        h = nn.Dense(cfg.trunk_dim, name="trunk2")(h)
        h = nn.relu(h)
        return {
            "emotion": nn.Dense(cfg.n_emotions, name="emotion_head")(h),
            "intent": nn.Dense(cfg.n_intents, name="intent_head")(h),
            "tone": nn.Dense(cfg.n_tones, name="tone_head")(h),
            "personality": nn.Dense(cfg.n_personality,
                                    name="personality_head")(h),
        }


TASK_WEIGHTS = {"emotion": 1.0, "intent": 0.8, "tone": 0.5,
                "personality": 0.3}


def emotion_multitask_loss(logits: Dict[str, jax.Array],
                           labels: Dict[str, jax.Array],
                           weights: Optional[Dict[str, float]] = None
                           ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Weighted sum of per-task CE; tasks with label -1 are masked out."""
    weights = weights or TASK_WEIGHTS
    total = jnp.zeros(())
    per_task = {}
    for task, lg in logits.items():
        if task not in labels:
            continue
        lab = labels[task]
        mask = (lab >= 0).astype(jnp.float32)
        safe = jnp.maximum(lab, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(lg, safe)
        ce = (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        per_task[task] = ce
        total = total + weights.get(task, 1.0) * ce
    return total, per_task
