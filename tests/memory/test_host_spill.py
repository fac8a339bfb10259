"""Host-spilled bank: FIFO/decay semantics + exact-rerank parity.

The spilled bank must behave exactly like the device-resident engine
(reference semantics: /root/reference/src/core/hippocampal.py:195-319) —
only the placement of the exact rows differs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory import engine
from aura_snn_rag_tpu.memory.host_spill import SpilledBank
from aura_snn_rag_tpu.memory.state import init_memory_state


def _cfg(**kw):
    base = dict(max_memories=512, feature_dim=128, k_centroids=16,
                n_place_cells=8, n_grid_cells=4, n_time_cells=2,
                flat_block_funnel=16, coarse_dtype="int8")
    base.update(kw)
    return MemoryConfig(**base)


def _data(n, d, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, d).astype(np.float32)


def test_self_retrieval_and_uniqueness():
    cfg = _cfg()
    bank = SpilledBank(cfg)
    feats = _data(300, cfg.feature_dim)
    bank.write(feats)
    r = bank.retrieve(feats[:32], k=5)
    assert r.indices.shape == (32, 5)
    assert (r.indices[:, 0] == np.arange(32)).all()
    for row in r.indices:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live)
    assert np.isfinite(r.scores).all()
    # returned features are the exact f32 rows
    np.testing.assert_allclose(r.features[:, 0], feats[:32], rtol=1e-6)


def test_parity_vs_engine_bruteforce():
    """Spilled top-k == device engine brute-force top-k on the same bank."""
    cfg = _cfg()
    feats = _data(400, cfg.feature_dim, seed=3)
    bank = SpilledBank(cfg)
    bank.write(feats)

    st = init_memory_state(cfg)
    st = engine.write_memories(cfg, st, jnp.asarray(feats),
                               jnp.zeros((400, 2), jnp.float32))
    q = _data(24, cfg.feature_dim, seed=4)
    r_spill = bank.retrieve(q, k=10)
    r_exact = engine.retrieve_bruteforce(cfg, st, jnp.asarray(q), None, 10)
    agree = np.mean([
        len(set(a[a >= 0].tolist()) & set(np.asarray(b)[
            np.asarray(b) >= 0].tolist())) / 10
        for a, b in zip(r_spill.indices, np.asarray(r_exact.indices))])
    assert agree >= 0.99


def test_fifo_overwrite_at_spilled_scale():
    """Writes past capacity wrap: the oldest rows vanish from retrieval and
    the new occupants are found (hippocampal.py:200-204 FIFO semantics)."""
    cfg = _cfg(max_memories=64)
    bank = SpilledBank(cfg)
    first = _data(64, cfg.feature_dim, seed=1)
    bank.write(first)
    second = _data(16, cfg.feature_dim, seed=2)   # overwrites slots 0..15
    bank.write(second)
    assert bank.count == 80 and bank.active_count == 64

    # the overwritten row's old vector must NOT come back as slot i
    r_old = bank.retrieve(first[:8], k=1)
    for i, row in enumerate(np.asarray(r_old.indices)):
        if row[0] in range(8):
            # slot collision is only OK if the new occupant genuinely is
            # the nearest — verify it's not the old vector's features
            assert not np.allclose(r_old.features[i, 0], first[i])
    # the new occupants ARE found at their slots
    r_new = bank.retrieve(second, k=1)
    assert (np.asarray(r_new.indices)[:, 0] == np.arange(16)).all()
    np.testing.assert_allclose(r_new.features[:, 0], second, rtol=1e-6)


def test_decay_reorders_and_tick_ages():
    cfg = _cfg(w_temporal=0.0)     # isolate strength decay
    bank = SpilledBank(cfg)
    a = _data(1, cfg.feature_dim, seed=5)
    bank.write(a)                  # slot 0
    bank.write(a + 0.01 * _data(1, cfg.feature_dim, seed=6))  # slot 1, ~dup
    r0 = bank.retrieve(a, k=2)
    assert r0.indices[0, 0] == 0
    for _ in range(60):
        bank.decay(0.2)            # crush slot 0/1 equally…
    bank.write(a + 0.02 * _data(1, cfg.feature_dim, seed=7))  # fresh slot 2
    r1 = bank.retrieve(a, k=2)
    assert r1.indices[0, 0] == 2   # fresh strength wins over decayed exact
    assert r1.scores[0, 0] > r1.scores[0, 1]


def test_temporal_term_prefers_recent():
    cfg = _cfg(w_temporal=0.5, seconds_per_step=600.0)
    bank = SpilledBank(cfg)
    v = _data(1, cfg.feature_dim, seed=8)
    bank.write(v)                  # slot 0 at step 0
    bank.tick(10.0)                # 6000 s later
    bank.write(v)                  # slot 1, identical vector, fresh
    r = bank.retrieve(v, k=2)
    assert r.indices[0, 0] == 1    # newer copy outranks older


def test_spatial_scoring():
    cfg = _cfg(w_spatial=5.0)
    bank = SpilledBank(cfg)
    v = _data(1, cfg.feature_dim, seed=9)
    locs = np.array([[0.0, 0.0], [10.0, 10.0]], np.float32)
    bank.write(np.concatenate([v, v]), locs)
    near = bank.retrieve(v, k=2, query_locations=np.array([[0.1, 0.0]]))
    assert near.indices[0, 0] == 0
    far = bank.retrieve(v, k=2, query_locations=np.array([[10.0, 9.9]]))
    assert far.indices[0, 0] == 1


def test_retrieve_stream_matches_single():
    cfg = _cfg()
    bank = SpilledBank(cfg)
    bank.write(_data(256, cfg.feature_dim, seed=10))
    batches = [_data(16, cfg.feature_dim, seed=s) for s in (11, 12, 13)]
    streamed = bank.retrieve_stream(batches, k=5)
    for q, rs in zip(batches, streamed):
        r = bank.retrieve(q, k=5)
        np.testing.assert_array_equal(rs.indices, r.indices)
        np.testing.assert_allclose(rs.scores, r.scores, rtol=1e-6)


def test_retrieve_stream_coalesce_exact():
    """Coalesced funnel dispatches split back to the caller's (uneven)
    batch structure with per-query results identical to lone retrieves,
    at every coalesce width (1 query/dispatch up to everything packed)."""
    cfg = _cfg()
    bank = SpilledBank(cfg)
    bank.write(_data(256, cfg.feature_dim, seed=20))
    batches = [_data(n, cfg.feature_dim, seed=30 + n) for n in (3, 16, 7, 16)]
    singles = [bank.retrieve(q, k=5) for q in batches]
    for width in (1, 16, 23, 10_000):
        streamed = bank.retrieve_stream(batches, k=5, coalesce=width)
        assert len(streamed) == len(batches)
        for q, rs, r in zip(batches, streamed, singles):
            assert rs.indices.shape == (q.shape[0], 5)
            np.testing.assert_array_equal(rs.indices, r.indices)
            np.testing.assert_allclose(rs.scores, r.scores, rtol=1e-6)


def test_kernel_path_matches_xla_fallback(monkeypatch):
    """Interpret-mode Pallas kernel == XLA fallback math on CPU."""
    cfg = _cfg()
    feats = _data(320, cfg.feature_dim, seed=14)
    q = _data(8, cfg.feature_dim, seed=15)

    bank = SpilledBank(cfg)
    bank.write(feats)
    r_xla = bank.retrieve(q, k=10)

    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    bank2 = SpilledBank(cfg)
    bank2.write(feats)
    r_krn = bank2.retrieve(q, k=10)
    np.testing.assert_array_equal(r_krn.indices, r_xla.indices)
    np.testing.assert_allclose(r_krn.scores, r_xla.scores, rtol=1e-5)


def test_bf16_coarse_mode():
    cfg = _cfg(coarse_dtype="bf16")
    bank = SpilledBank(cfg)
    feats = _data(200, cfg.feature_dim, seed=16)
    bank.write(feats)
    r = bank.retrieve(feats[:8], k=3)
    assert (r.indices[:, 0] == np.arange(8)).all()


def test_oversized_write_keeps_last_m():
    cfg = _cfg(max_memories=32)
    bank = SpilledBank(cfg)
    feats = _data(80, cfg.feature_dim, seed=17)
    bank.write(feats)
    assert bank.active_count == 32
    r = bank.retrieve(feats[-4:], k=1)
    np.testing.assert_allclose(r.features[:, 0], feats[-4:], rtol=1e-6)


def test_two_stage_row_funnel_matches_single_stage():
    """spill_funnel_rows rescoring must keep the exact top-k: the second
    stage ranks by the same coarse score the block funnel maximized, so a
    row funnel >= k*4 retains everything the host rerank would pick at
    test scale (dense funnel vs tiny bank)."""
    feats = _data(400, 128, seed=11)
    q = _data(24, 128, seed=12)
    res = {}
    for rows in (0, 64):      # 0 = single-stage (F=128 passthrough)
        cfg = _cfg(spill_funnel_rows=rows)
        bank = SpilledBank(cfg)
        bank.write(feats)
        res[rows] = bank.retrieve(q, k=10)
    agree = np.mean([
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist())) / 10
        for a, b in zip(res[0].indices, res[64].indices)])
    assert agree >= 0.99
    np.testing.assert_allclose(
        np.sort(res[0].scores, axis=1), np.sort(res[64].scores, axis=1),
        rtol=1e-4)


def test_two_stage_funnel_shape_is_row_funnel():
    """The transfer payload shrinks to [Bp, spill_funnel_rows]."""
    cfg = _cfg(spill_funnel_rows=32)
    bank = SpilledBank(cfg)
    bank.write(_data(300, 128, seed=13))
    _, _, funnel = bank._dispatch_funnel(_data(8, 128, seed=14))
    assert funnel.shape[1] == 32


def test_query_chunked_funnel_matches_unchunked():
    """spill_query_chunk > 0 runs the device funnel through lax.map in
    fixed-size chunks (the B=1024 x 10M HBM-OOM fix); results must be
    identical to the single-dispatch funnel for any B, including B not a
    multiple of the chunk (caller pads)."""
    feats = _data(400, 128, seed=7)
    q = _data(300, 128, seed=8)   # 300 % 128 != 0: exercises pad + slice
    outs = {}
    for chunk in (0, 128):
        cfg = _cfg(spill_query_chunk=chunk)
        bank = SpilledBank(cfg)
        bank.write(feats)
        outs[chunk] = bank.retrieve(q, k=10)
    np.testing.assert_array_equal(outs[0].indices, outs[128].indices)
    np.testing.assert_allclose(outs[0].scores, outs[128].scores, rtol=1e-6)


def test_query_chunked_two_stage_funnel():
    """Chunking composes with the second-stage row funnel."""
    feats = _data(400, 128, seed=9)
    q = _data(256, 128, seed=10)
    cfg = _cfg(spill_query_chunk=128, spill_funnel_rows=32)
    bank = SpilledBank(cfg)
    bank.write(feats)
    cfg0 = _cfg(spill_query_chunk=0, spill_funnel_rows=32)
    bank0 = SpilledBank(cfg0)
    bank0.write(feats)
    a = bank.retrieve(q, k=5)
    b = bank0.retrieve(q, k=5)
    np.testing.assert_array_equal(a.indices, b.indices)


def test_native_rerank_matches_numpy():
    """The fused C++ rerank (native/spill_rerank.cpp) must reproduce the
    numpy reference path: same winners, same scores (up to summation-order
    float noise), including after decay/tick (metadata terms live)."""
    from aura_snn_rag_tpu.memory import host_spill

    if host_spill._RERANK_NATIVE is None:
        pytest.skip("native library unavailable")
    cfg = _cfg()
    bank = SpilledBank(cfg)
    feats = _data(400, cfg.feature_dim, seed=11)
    bank.write(feats[:200])
    bank.decay(0.05)
    bank.tick(3.0)
    bank.write(feats[200:])
    q = _data(64, cfg.feature_dim, seed=12)
    qn, qp, qsp, B, use_kernel = bank._prep_queries(q)
    funnel = np.asarray(bank._dispatch_funnel(q)[2])
    a = bank._host_rerank(qn, B, funnel, 10, None, use_native=True)
    b = bank._host_rerank(qn, B, funnel, 10, None, use_native=False)
    # scores agree to float-sum noise; winners agree as sets (near-ties
    # may swap order between BLAS and the C++ accumulator)
    np.testing.assert_allclose(
        np.sort(a.scores, axis=1), np.sort(b.scores, axis=1),
        rtol=2e-5, atol=2e-6)
    for ra, rb in zip(a.indices, b.indices):
        assert set(ra[ra >= 0].tolist()) == set(rb[rb >= 0].tolist())


def test_native_rerank_dead_lanes_and_small_bank():
    """Fewer live candidates than k: native path pads with slot -1 /
    score 0 exactly like the numpy path."""
    from aura_snn_rag_tpu.memory import host_spill

    if host_spill._RERANK_NATIVE is None:
        pytest.skip("native library unavailable")
    cfg = _cfg()
    bank = SpilledBank(cfg)
    bank.write(_data(5, cfg.feature_dim, seed=13))   # bank smaller than k
    q = _data(8, cfg.feature_dim, seed=14)
    r = bank.retrieve(q, k=10)
    for row, srow in zip(r.indices, r.scores):
        live = row >= 0
        assert live.sum() == 5
        assert (srow[~live] == 0.0).all()
