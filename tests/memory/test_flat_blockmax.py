"""Flat-scan block-max funnel: kernel + XLA variants vs brute force.

The funnel guarantee under test (ops/pallas/flat_scan.py): the top
`flat_block_funnel >= k` blocks by coarse maximum provably contain every
coarse top-k element, so after the exact f32 rerank the result must equal
the brute-force ranking whenever the coarse scores resolve the ordering.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory import (
    init_memory_state, rebuild_centroids, retrieve_bruteforce, retrieve_flat)
from aura_snn_rag_tpu.memory.engine import bulk_load, decay_memories


def _cfg(n, **kw):
    return MemoryConfig(max_memories=n, feature_dim=128, k_centroids=16,
                        probe_centroids=4, retrieve_k=5,
                        n_place_cells=8, n_grid_cells=4, n_time_cells=2,
                        **kw)


def _loaded_state(cfg, used, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(used, cfg.feature_dim).astype(np.float32)
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((used, 2), np.float32))
    return state, feats


def test_blockmax_matches_bruteforce_full_bank():
    cfg = _cfg(2048, flat_strategy="blockmax")
    state, feats = _loaded_state(cfg, 2048)
    q = jnp.asarray(feats[:7] + 0.05 * np.random.RandomState(1)
                    .randn(7, cfg.feature_dim).astype(np.float32))
    r = retrieve_flat(cfg, state, q, None, 5)
    rb = retrieve_bruteforce(cfg, state, q, None, 5)
    np.testing.assert_array_equal(np.asarray(r.indices),
                                  np.asarray(rb.indices))
    np.testing.assert_allclose(np.asarray(r.scores),
                               np.asarray(rb.scores), rtol=2e-5, atol=2e-6)


def test_blockmax_kernel_interpret_matches_xla(monkeypatch):
    """The Pallas kernel (interpreter) must agree with the XLA block-max
    fallback — non-divisible M exercises the masked tail tile."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    # M = 1500: not a multiple of TILE_M(1024) or of 8 -> tail coverage
    cfg = _cfg(1500, flat_strategy="blockmax")
    state, feats = _loaded_state(cfg, 1400)
    q = jnp.asarray(feats[:5])

    from aura_snn_rag_tpu.memory import engine as eng
    r_kernel = retrieve_flat(cfg, state, q, None, 5)
    monkeypatch.setattr(eng, "_flat_kernel_ok",
                        lambda *a, **k: False)
    r_xla = eng._retrieve_flat_blockmax(cfg, state, q, None, 5)
    np.testing.assert_array_equal(np.asarray(r_kernel.indices),
                                  np.asarray(r_xla.indices))
    np.testing.assert_allclose(np.asarray(r_kernel.scores),
                               np.asarray(r_xla.scores),
                               rtol=2e-5, atol=2e-6)


def test_blockmax_matches_scan_strategy():
    cfg_b = _cfg(4096, flat_strategy="blockmax")
    cfg_s = _cfg(4096, flat_strategy="scan")
    state, feats = _loaded_state(cfg_b, 4096)
    rng = np.random.RandomState(3)
    q = jnp.asarray(feats[100:108]
                    + 0.05 * rng.randn(8, cfg_b.feature_dim)
                    .astype(np.float32))
    r_b = retrieve_flat(cfg_b, state, q, None, 10)
    r_s = retrieve_flat(cfg_s, state, q, None, 10)
    np.testing.assert_array_equal(np.asarray(r_b.indices),
                                  np.asarray(r_s.indices))


def test_blockmax_sparse_bank_no_duplicates():
    """Bank far smaller than the funnel: dead blocks must come back as
    -1/0, never as duplicated live slots."""
    cfg = _cfg(2048, flat_strategy="blockmax")
    state, feats = _loaded_state(cfg, 12)
    q = jnp.asarray(feats[:3])
    r = retrieve_flat(cfg, state, q, None, 5)
    idx = np.asarray(r.indices)
    sc = np.asarray(r.scores)
    assert (idx[:, 0] == np.arange(3)).all()
    assert ((idx >= 0) | (sc == 0.0)).all()
    for row in idx:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live), row
    rb = retrieve_bruteforce(cfg, state, q, None, 5)
    np.testing.assert_array_equal(idx, np.asarray(rb.indices))


def test_blockmax_with_locations_and_decay():
    """Spatial queries take the XLA fallback; scores must still match
    brute force after strength decay."""
    cfg = _cfg(2048, flat_strategy="blockmax")
    state, feats = _loaded_state(cfg, 1000)
    for _ in range(2):
        state = decay_memories(state, 0.15)
    rng = np.random.RandomState(5)
    q = jnp.asarray(feats[:4])
    loc = jnp.asarray(rng.randn(4, 2).astype(np.float32))
    r = retrieve_flat(cfg, state, q, loc, 5)
    rb = retrieve_bruteforce(cfg, state, q, loc, 5)
    np.testing.assert_array_equal(np.asarray(r.indices),
                                  np.asarray(rb.indices))
    np.testing.assert_allclose(np.asarray(r.scores),
                               np.asarray(rb.scores), rtol=2e-5, atol=2e-6)


def test_blockmax_int8_coarse_recall():
    """int8 coarse bank: funnel ordering is quantized, but the exact f32
    rerank must keep recall@5 = 1.0 vs brute force on separated data."""
    cfg = _cfg(2048, flat_strategy="blockmax", coarse_dtype="int8")
    rng = np.random.RandomState(7)
    centers = rng.randn(32, 128).astype(np.float32) * 2.0
    feats = (centers[rng.randint(0, 32, 2048)]
             + rng.randn(2048, 128).astype(np.float32))
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((2048, 2), np.float32))
    q = jnp.asarray(feats[:16])
    r = retrieve_flat(cfg, state, q, None, 5)
    rb = retrieve_bruteforce(cfg, state, q, None, 5)
    got = np.asarray(r.indices)
    want = np.asarray(rb.indices)
    recall = np.mean([len(set(g) & set(w)) / 5.0
                      for g, w in zip(got, want)])
    assert recall == 1.0, (recall, got[:3], want[:3])


def test_blockmax_tile_m_knob(monkeypatch):
    """config.flat_tile_m reaches the kernel and larger tiles give
    identical retrieval (tail blocks of a non-divisible M stay -inf)."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    base = _cfg(3000, flat_strategy="blockmax")
    state, feats = _loaded_state(base, 2900)
    q = jnp.asarray(feats[:5])
    ref = retrieve_flat(base, state, q, None, 5)
    for tile in (2048, 4096):
        cfg = _cfg(3000, flat_strategy="blockmax", flat_tile_m=tile)
        r = retrieve_flat(cfg, state, q, None, 5)
        np.testing.assert_array_equal(np.asarray(r.indices),
                                      np.asarray(ref.indices))
        np.testing.assert_allclose(np.asarray(r.scores),
                                   np.asarray(ref.scores),
                                   rtol=2e-5, atol=2e-6)
