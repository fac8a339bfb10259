"""Deterministic n-gram hash embedder.

Parity with `FastHashEmbedder` (/root/reference/src/encoders/
fast_hash_embedder.py:10-99): byte n-grams (sizes 2..5) hashed (FNV-1a) into
a fixed-dim embedding, accumulated and L2-normalized; a token-index path
returns hashed ids for the STDP learner.

Host-side feature extraction (text never touches the device); the hot loop
is vectorized numpy over a byte matrix. A C++ drop-in with the same API is
the planned native data-loader path.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a_rows(mat: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over the rows of a [N, L] uint8 matrix → [N] uint64."""
    h = np.full(mat.shape[0], _FNV_OFFSET, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            h = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
    return h


class FastHashEmbedder:
    """n-gram hash embeddings: deterministic, vocabulary-free."""

    def __init__(self, dim: int = 768, ngram_sizes: Sequence[int] = (2, 3, 4, 5),
                 token_vocab: int = 32000):
        self.dim = dim
        self.ngram_sizes = tuple(ngram_sizes)
        self.token_vocab = token_vocab

    def _ngrams(self, data: np.ndarray, n: int) -> np.ndarray:
        if len(data) < n:
            return np.zeros((0, n), np.uint8)
        idx = np.arange(len(data) - n + 1)[:, None] + np.arange(n)[None, :]
        return data[idx]

    def embed(self, text: str) -> np.ndarray:
        """text → L2-normalized [dim] float32 embedding."""
        data = np.frombuffer(text.encode("utf-8", "ignore"), np.uint8)
        vec = np.zeros(self.dim, np.float32)
        for n in self.ngram_sizes:
            grams = self._ngrams(data, n)
            if len(grams) == 0:
                continue
            h = _fnv1a_rows(grams)
            slots = (h % np.uint64(self.dim)).astype(np.int64)
            signs = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            np.add.at(vec, slots, signs.astype(np.float32))
        norm = float(np.linalg.norm(vec))
        return vec / norm if norm > 0 else vec

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([self.embed(t) for t in texts])

    def token_indices(self, text: str) -> np.ndarray:
        """Hashed token ids (whitespace tokens → FNV-1a % vocab) for STDP."""
        toks = text.split()
        if not toks:
            return np.zeros((0,), np.int64)
        ids = []
        for t in toks:
            b = np.frombuffer(t.encode("utf-8", "ignore"), np.uint8)
            h = _fnv1a_rows(b[None, :]) if len(b) else np.zeros(1, np.uint64)
            ids.append(int(h[0] % np.uint64(self.token_vocab)))
        return np.asarray(ids, np.int64)
