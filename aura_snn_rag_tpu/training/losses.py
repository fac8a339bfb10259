"""Composite LM loss.

Parity with `HippocampalLoss` (/root/reference/src/training/losses.py:5-48):
1. cross-entropy with label smoothing (next-token prediction),
2. entropy regularization SUBTRACTED from the loss — i.e. entropy is
   maximized to fight repetition loops (note the sign, losses.py:33-37),
3. place-cell sparsity L2 penalty toward the ~3% target (:41-46).

Adds masking for padded positions (label == ignore_index, the -100 convention
the reference's production notebook uses, aura_nemotron_cc2_pretraining.py:229).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def hippocampal_loss(logits: jax.Array, labels: jax.Array,
                     place_activity: Optional[jax.Array] = None,
                     label_smoothing: float = 0.1,
                     entropy_lambda: float = 0.05,
                     sparsity_lambda: float = 0.02,
                     target_sparsity: float = 0.03,
                     ignore_index: int = -100) -> jax.Array:
    """logits [B, L, V], labels [B, L] → scalar loss."""
    V = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    mask = (labels != ignore_index).astype(jnp.float32)
    safe_labels = jnp.where(labels == ignore_index, 0, labels)

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_labels[..., None],
                               axis=-1)[..., 0]
    if label_smoothing > 0:
        smooth = -log_probs.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (nll * mask).sum() / denom

    if entropy_lambda > 0:
        probs = jnp.exp(log_probs)
        entropy = -(probs * log_probs).sum(axis=-1)
        entropy = (entropy * mask).sum() / denom
        loss = loss - entropy_lambda * entropy

    if place_activity is not None and sparsity_lambda > 0:
        current = place_activity.mean()
        loss = loss + sparsity_lambda * (current - target_sparsity) ** 2

    return loss


def perplexity(loss_ce: jax.Array) -> jax.Array:
    return jnp.exp(loss_ce)
