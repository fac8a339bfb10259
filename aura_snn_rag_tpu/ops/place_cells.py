"""Sparse place-cell population coding.

Parity with `PlaceCellSemanticEncoder`'s sparsification step
(/root/reference/src/core/language_zone/place_cell_encoder.py:84-103): the top
~3% of place-cell logits fire with sigmoid activation, the rest are zero.

TPU idiom: instead of the reference's topk + scatter (a gather/scatter pair
that maps poorly to the VPU), we compute the k-th largest logit per position
with `jax.lax.top_k` and build the sparse activity as a threshold mask
`sigmoid(logits) * (logits >= kth)`. Identical forward semantics (modulo
ties), no scatter, and XLA fuses the compare+select into the surrounding
matmuls.
"""

from __future__ import annotations

from typing import Tuple

import jax


def sparse_place_code(logits: jax.Array, k: int) -> jax.Array:
    """Sparsify [..., N] place-cell logits to exactly-k (modulo ties) winners.

    Returns activity in [0, 1]: sigmoid on winners, zero elsewhere.
    """
    kth = jax.lax.top_k(logits, k)[0][..., -1:]  # [..., 1] k-th largest value
    mask = (logits >= kth).astype(logits.dtype)
    return jax.nn.sigmoid(logits) * mask


def place_cell_encode(token_embeds: jax.Array,
                      w_proj: jax.Array, b_proj: jax.Array,
                      w_back: jax.Array, b_back: jax.Array,
                      k: int, residual_scale: float = 0.1
                      ) -> Tuple[jax.Array, jax.Array]:
    """Full place-cell encoding path (place_cell_encoder.py:74-111).

    embed → project to place space → sparse top-k sigmoid → reconstruct →
    `token_embeds + residual_scale * reconstructed`.

    Returns (semantic_embedding [..., D], place_activity [..., N]).
    """
    place_logits = token_embeds @ w_proj + b_proj
    activity = sparse_place_code(place_logits, k)
    reconstructed = activity @ w_back + b_back
    return token_embeds + residual_scale * reconstructed, activity
