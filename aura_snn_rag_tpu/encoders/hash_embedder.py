"""Deterministic n-gram hash embedder.

Parity with `FastHashEmbedder` (/root/reference/src/encoders/
fast_hash_embedder.py:10-99): byte n-grams (sizes 2..5) hashed (FNV-1a) into
a fixed-dim embedding, accumulated and L2-normalized; a token-index path
returns hashed ids for the STDP learner.

Host-side feature extraction (text never touches the device). Two
implementations with identical outputs:
- native C++ (native/hash_embedder.cpp via ctypes) — the ingestion hot
  path, used automatically when native/libaura_native.so is built;
- vectorized numpy fallback.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _load_native():
    from aura_snn_rag_tpu._native import load
    lib = load()
    if lib is None:
        return None
    try:
        lib.aura_hash_embed.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.aura_hash_embed_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.aura_token_indices.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int64]
        lib.aura_token_indices.restype = ctypes.c_int
        return lib
    except (OSError, AttributeError):
        return None


_NATIVE = _load_native()

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
                 token_vocab: int = 32000, use_native: bool = True):
        self.dim = dim
        self.ngram_sizes = tuple(ngram_sizes)
        self.token_vocab = token_vocab
        self._native = _NATIVE if use_native else None
        if self._native is not None:
            self._ng = (ctypes.c_int * len(self.ngram_sizes))(
                *self.ngram_sizes)

    def _ngrams(self, data: np.ndarray, n: int) -> np.ndarray:
        if len(data) < n:
            return np.zeros((0, n), np.uint8)
        idx = np.arange(len(data) - n + 1)[:, None] + np.arange(n)[None, :]
        return data[idx]

    def embed(self, text: str) -> np.ndarray:
        """text → L2-normalized [dim] float32 embedding."""
        data = np.frombuffer(text.encode("utf-8", "ignore"), np.uint8)
        if self._native is not None:
            out = np.zeros(self.dim, np.float32)
            buf = data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) \
                if len(data) else (ctypes.c_uint8 * 1)()
            self._native.aura_hash_embed(
                buf, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.dim, self._ng, len(self.ngram_sizes))
            return out
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
        if self._native is not None and texts:
            blobs = [t.encode("utf-8", "ignore") for t in texts]
            concat = np.frombuffer(b"".join(blobs), np.uint8).copy()
            offsets = np.zeros(len(blobs) + 1, np.int64)
            np.cumsum([len(b) for b in blobs], out=offsets[1:])
            out = np.zeros((len(blobs), self.dim), np.float32)
            buf = concat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) \
                if len(concat) else (ctypes.c_uint8 * 1)()
            self._native.aura_hash_embed_batch(
                buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(blobs),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.dim, self._ng, len(self.ngram_sizes))
            return out
        return np.stack([self.embed(t) for t in texts])

    def token_indices(self, text: str, max_tokens: int = 4096) -> np.ndarray:
        """Hashed token ids (whitespace tokens → FNV-1a % vocab) for STDP."""
        if self._native is not None:
            data = np.frombuffer(text.encode("utf-8", "ignore"), np.uint8)
            out = np.zeros(max_tokens, np.int64)
            buf = data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) \
                if len(data) else (ctypes.c_uint8 * 1)()
            n = self._native.aura_token_indices(
                buf, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                max_tokens, self.token_vocab)
            return out[:n]
        toks = text.split()
        if not toks:
            return np.zeros((0,), np.int64)
        ids = []
        for t in toks:
            b = np.frombuffer(t.encode("utf-8", "ignore"), np.uint8)
            h = _fnv1a_rows(b[None, :]) if len(b) else np.zeros(1, np.uint64)
            ids.append(int(h[0] % np.uint64(self.token_vocab)))
        return np.asarray(ids, np.int64)
