"""Fused IVF v2 kernel (gather + metadata score + per-probe exact top-k).

Runs the Pallas kernel through the interpreter on CPU (AURA_PALLAS_INTERPRET)
and checks (a) the kernel against a numpy reference of the same math, and
(b) the full `retrieve` v2 path against the pure-XLA path — the funnels
differ (per-probe exact top-k vs approx_max_k) but both feed the same exact
f32 rerank, so final results must agree.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory import (
    init_memory_state, rebuild_centroids, retrieve)
from aura_snn_rag_tpu.memory.engine import bulk_load, write_memories
from aura_snn_rag_tpu.ops.pallas.ivf_scan import KPAD, ivf_topk_scores


def test_kernel_per_probe_topk_matches_numpy():
    rng = np.random.RandomState(0)
    K, C, D, B, P, k = 16, 128, 64, 3, 4, 10
    clustered = rng.randn(K, C, D).astype(np.float32)
    clustered /= np.linalg.norm(clustered, axis=-1, keepdims=True)
    clustered16 = jnp.asarray(clustered, jnp.bfloat16)
    aux = np.zeros((K, 8, C), np.float32)
    aux[:, 0] = rng.rand(K, C) + 0.5                     # mul term
    aux[:, 1] = rng.randn(K, C) * 0.1                    # add term
    aux[:, 2] = rng.randint(0, 10_000, (K, C))           # bank slots
    q = rng.randn(B, D).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    top_c = rng.randint(0, K, (B, P)).astype(np.int32)

    s, sl = ivf_topk_scores(clustered16, jnp.asarray(aux), jnp.asarray(qn),
                            jnp.asarray(top_c), k, interpret=True)
    s, sl = np.asarray(s), np.asarray(sl)
    assert s.shape == (B, P, KPAD) and sl.shape == (B, P, KPAD)

    # numpy reference at the kernel's own precision (bf16 inputs, f32 acc)
    q16 = np.asarray(jnp.asarray(qn, jnp.bfloat16).astype(jnp.float32))
    c32 = np.asarray(clustered16.astype(jnp.float32))
    for b in range(B):
        for p in range(P):
            cid = top_c[b, p]
            cos = c32[cid] @ q16[b]
            comb = aux[cid, 0] * cos + aux[cid, 1]
            order = np.argsort(-comb)[:k]
            np.testing.assert_allclose(
                np.sort(s[b, p, :k])[::-1], comb[order], rtol=0, atol=2e-2)
            # emitted slots = slots of the top-k entries (set compare:
            # near-tie scores may permute)
            assert (set(sl[b, p, :k].tolist())
                    == set(aux[cid, 2, order].astype(int).tolist()))


def _mk_cfg(n, **kw):
    return MemoryConfig(max_memories=n, feature_dim=64, k_centroids=16,
                        probe_centroids=4, retrieve_k=5,
                        bucket_overprovision=2.0, rebuild_lloyd_iters=2,
                        n_place_cells=8, n_grid_cells=4, n_time_cells=2,
                        **kw)


def test_retrieve_v2_matches_xla_path(monkeypatch):
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(1)
    N = 4096
    cfg = _mk_cfg(N, ivf_kernel="v2")                     # pallas v2 path
    cfg_x = dataclasses.replace(cfg, use_pallas_ivf=False)
    feats = rng.randn(N, 64).astype(np.float32)
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), np.float32))
    state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))

    q = jnp.asarray(feats[:6] + 0.1 * rng.randn(6, 64).astype(np.float32))
    r_v2 = retrieve(cfg, state, q, None, 5)
    r_x = retrieve(cfg_x, state, q, None, 5)
    # same exact f32 rerank on both paths -> identical final top-k
    np.testing.assert_array_equal(np.asarray(r_v2.indices),
                                  np.asarray(r_x.indices))
    np.testing.assert_allclose(np.asarray(r_v2.scores),
                               np.asarray(r_x.scores), rtol=1e-5)


def test_retrieve_v2_respects_decay_and_fifo(monkeypatch):
    """Metadata terms (strength decay, FIFO liveness) ride inside the fused
    kernel via the aux rows — verify they still shape the ranking."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    from aura_snn_rag_tpu.memory.engine import decay_memories

    rng = np.random.RandomState(2)
    N = 512
    cfg = _mk_cfg(N)
    feats = rng.randn(N, 64).astype(np.float32)
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), np.float32))
    state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))

    q = jnp.asarray(feats[:2])
    before = retrieve(cfg, state, q, None, 5)
    # heavy decay then one fresh duplicate write of query 0's vector:
    # the fresh write must win slot ranking for query 0
    for _ in range(8):
        state = decay_memories(state, 0.5)
    state = write_memories(cfg, state, q[:1], jnp.zeros((1, 2), np.float32))
    after = retrieve(cfg, state, q, None, 5)
    assert int(np.asarray(after.indices)[0, 0]) == N % cfg.max_memories or \
        np.asarray(after.scores)[0, 0] > np.asarray(before.scores)[0, 0]
    # all results finite and valid
    assert np.isfinite(np.asarray(after.scores)).all()


def test_retrieve_v2_partial_bank(monkeypatch):
    """Invalid (never-written) cluster entries must never surface."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(3)
    N, used = 2048, 300
    cfg = _mk_cfg(N)
    feats = rng.randn(used, 64).astype(np.float32)
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((used, 2), np.float32))
    state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))
    q = jnp.asarray(feats[:4])
    res = retrieve(cfg, state, q, None, 5)
    idx = np.asarray(res.indices)
    assert ((idx >= -1) & (idx < used)).all()
    # self-retrieval: the query's own row must rank first
    assert (idx[:, 0] == np.arange(4)).all()


def test_retrieve_precomputed_aux_identical(monkeypatch):
    """retrieve(aux=build_ivf_aux(...)) must equal retrieve() exactly, and
    the wrapper's per-state aux cache must invalidate on mutation."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    from aura_snn_rag_tpu.memory.engine import build_ivf_aux, decay_memories
    from aura_snn_rag_tpu.memory.hippocampus import HippocampalFormation

    rng = np.random.RandomState(4)
    N = 2048
    cfg = _mk_cfg(N)
    feats = rng.randn(N, 64).astype(np.float32)
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), np.float32))
    state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))

    q = jnp.asarray(feats[:5] + 0.05 * rng.randn(5, 64).astype(np.float32))
    aux = build_ivf_aux(cfg, state)
    r_inline = retrieve(cfg, state, q, None, 5)
    r_pre = retrieve(cfg, state, q, None, 5, aux=aux)
    np.testing.assert_array_equal(np.asarray(r_inline.indices),
                                  np.asarray(r_pre.indices))
    np.testing.assert_allclose(np.asarray(r_inline.scores),
                               np.asarray(r_pre.scores), rtol=0, atol=0)

    # wrapper cache: builds once, reuses for same state, rebuilds on decay
    h = HippocampalFormation(cfg)
    h.state, h.use_centroid_index = state, True
    h.retrieve_batch(q, k=5)
    first = h._aux_cache
    assert first is not None and first[0] is h.state
    h.retrieve_batch(q, k=5)
    assert h._aux_cache is first                    # cache hit (same state)
    h.decay_memories(0.3)                           # mutation → stale
    r_after = h.retrieve_batch(q, k=5)
    assert h._aux_cache is not first
    assert h._aux_cache[0] is h.state
    # decayed-state retrieval through the cache equals the direct engine call
    r_direct = retrieve(cfg, h.state, q, None, 5)
    np.testing.assert_array_equal(np.asarray(r_after.indices),
                                  np.asarray(r_direct.indices))


def test_kernel_v3_global_topkk_matches_numpy():
    from aura_snn_rag_tpu.ops.pallas.ivf_scan import ivf_candidates
    rng = np.random.RandomState(5)
    K, C, D, B, P, kk = 16, 128, 64, 3, 4, 128
    clustered = rng.randn(K, C, D).astype(np.float32)
    clustered /= np.linalg.norm(clustered, axis=-1, keepdims=True)
    clustered16 = jnp.asarray(clustered, jnp.bfloat16)
    aux = np.zeros((K, 8, C), np.float32)
    aux[:, 0] = rng.rand(K, C) + 0.5
    aux[:, 1] = rng.randn(K, C) * 0.1
    aux[:, 2] = rng.randint(0, 10_000, (K, C))
    q = rng.randn(B, D).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    top_c = np.stack([rng.choice(K, P, replace=False)
                      for _ in range(B)]).astype(np.int32)

    s, sl = ivf_candidates(clustered16, jnp.asarray(aux), jnp.asarray(qn),
                           jnp.asarray(top_c), kk, interpret=True)
    s, sl = np.asarray(s), np.asarray(sl)
    assert s.shape == (B, kk) and sl.shape == (B, kk)
    # sorted descending
    assert (np.diff(s, axis=1) <= 1e-6).all()

    q16 = np.asarray(jnp.asarray(qn, jnp.bfloat16).astype(jnp.float32))
    c32 = np.asarray(clustered16.astype(jnp.float32))
    for b in range(B):
        comb_all, slot_all = [], []
        for p in range(P):
            cid = top_c[b, p]
            cos = c32[cid] @ q16[b]
            comb_all.append(aux[cid, 0] * cos + aux[cid, 1])
            slot_all.append(aux[cid, 2])
        comb_all = np.concatenate(comb_all)
        slot_all = np.concatenate(slot_all).astype(int)
        order = np.argsort(-comb_all)[:kk]
        np.testing.assert_allclose(s[b], comb_all[order], rtol=0, atol=2e-2)
        assert set(sl[b].tolist()) == set(slot_all[order].tolist())


def test_retrieve_v3_matches_xla_path(monkeypatch):
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(6)
    N = 4096
    cfg3 = _mk_cfg(N, ivf_kernel="v3")
    cfg_x = _mk_cfg(N, use_pallas_ivf=False)
    feats = rng.randn(N, 64).astype(np.float32)
    state = init_memory_state(cfg3)
    state = bulk_load(cfg3, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), np.float32))
    state = rebuild_centroids(cfg3, state, jax.random.PRNGKey(0))

    q = jnp.asarray(feats[:6] + 0.1 * rng.randn(6, 64).astype(np.float32))
    r_v3 = retrieve(cfg3, state, q, None, 5)
    r_x = retrieve(cfg_x, state, q, None, 5)
    np.testing.assert_array_equal(np.asarray(r_v3.indices),
                                  np.asarray(r_x.indices))
    np.testing.assert_allclose(np.asarray(r_v3.scores),
                               np.asarray(r_x.scores), rtol=1e-5)


def test_retrieve_with_locations_spatial_ranking(monkeypatch):
    """query_locations routes around the metadata-fused kernels (they fold
    only strength/temporal) and the spatial term 1/(1+d) must reorder
    cosine ties — reference scoring hippocampal.py:300-303."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(7)
    N, D = 1024, 64
    cfg = _mk_cfg(N)
    v = rng.randn(D).astype(np.float32)
    feats = rng.randn(N, D).astype(np.float32)
    # two duplicate memories of the query vector at different places
    feats[10] = v
    feats[20] = v
    locs = rng.randn(N, 2).astype(np.float32) * 10
    locs[10] = (9.0, 9.0)                       # far from query location
    locs[20] = (0.1, 0.1)                       # near query location
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats), jnp.asarray(locs))
    state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))

    q = jnp.asarray(v)[None, :]
    qloc = jnp.asarray([[0.0, 0.0]], jnp.float32)
    res = retrieve(cfg, state, q, qloc, 5)
    idx = np.asarray(res.indices)[0]
    # both duplicates retrieved; the spatially-near one ranks above the far
    assert 20 in idx and 10 in idx
    assert list(idx).index(20) < list(idx).index(10)
    # and agrees with the brute-force path
    from aura_snn_rag_tpu.memory import retrieve_bruteforce
    bf = retrieve_bruteforce(cfg, state, q, qloc, 5)
    assert int(np.asarray(bf.indices)[0, 0]) == int(idx[0])


def test_retrieve_v3r_fully_fused_matches_xla(monkeypatch):
    """v3r (in-kernel exact rerank + final top-k) must agree with the
    pure-XLA path on a planted-cluster bank (clear score margins)."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(8)
    N, D = 4096, 64
    cfg_r = _mk_cfg(N, ivf_kernel="v3r")
    cfg_x = _mk_cfg(N, use_pallas_ivf=False)
    centers = rng.randn(32, D).astype(np.float32) * 3.0
    feats = (centers[rng.randint(0, 32, N)]
             + 0.3 * rng.randn(N, D).astype(np.float32))
    state = init_memory_state(cfg_r)
    state = bulk_load(cfg_r, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), np.float32))
    state = rebuild_centroids(cfg_r, state, jax.random.PRNGKey(0))

    q = jnp.asarray(feats[:6] + 0.05 * rng.randn(6, D).astype(np.float32))
    r_r = retrieve(cfg_r, state, q, None, 5)
    r_x = retrieve(cfg_x, state, q, None, 5)
    np.testing.assert_array_equal(np.asarray(r_r.indices),
                                  np.asarray(r_x.indices))
    np.testing.assert_allclose(np.asarray(r_r.scores),
                               np.asarray(r_x.scores), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(r_r.features),
                               np.asarray(r_x.features), rtol=0, atol=0)


def test_retrieve_v3r_decay_and_partial_bank(monkeypatch):
    """v3r's in-kernel metadata (strength via aux, validity) must match the
    brute-force ranking after decays on a partially-filled bank."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    from aura_snn_rag_tpu.memory import retrieve_bruteforce
    from aura_snn_rag_tpu.memory.engine import decay_memories

    rng = np.random.RandomState(9)
    N, used, D = 2048, 700, 64
    cfg_r = _mk_cfg(N, ivf_kernel="v3r")
    feats = rng.randn(used, D).astype(np.float32)
    state = init_memory_state(cfg_r)
    state = bulk_load(cfg_r, state, jnp.asarray(feats),
                      jnp.zeros((used, 2), np.float32))
    state = rebuild_centroids(cfg_r, state, jax.random.PRNGKey(0))
    for _ in range(3):
        state = decay_memories(state, 0.2)

    q = jnp.asarray(feats[:4])
    r_r = retrieve(cfg_r, state, q, None, 5)
    r_b = retrieve_bruteforce(cfg_r, state, q, None, 5)
    idx = np.asarray(r_r.indices)
    assert ((idx >= -1) & (idx < used)).all()
    # probing full centroid set on this small bank -> identical to brute
    np.testing.assert_array_equal(idx[:, 0], np.asarray(r_b.indices)[:, 0])
    assert np.isfinite(np.asarray(r_r.scores)).all()


def test_retrieve_v3r_fewer_valid_than_funnel(monkeypatch):
    """Bank with fewer live rows than the kk funnel width: padding entries
    carry -1e30 scores and must come back as no-hit (-1), never slot 0."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(10)
    N, used, D = 2048, 40, 64
    cfg_r = _mk_cfg(N, ivf_kernel="v3r")
    feats = rng.randn(used, D).astype(np.float32)
    state = init_memory_state(cfg_r)
    state = bulk_load(cfg_r, state, jnp.asarray(feats),
                      jnp.zeros((used, 2), np.float32))
    state = rebuild_centroids(cfg_r, state, jax.random.PRNGKey(0))

    q = jnp.asarray(feats[:3])
    res = retrieve(cfg_r, state, q, None, 5)
    idx = np.asarray(res.indices)
    sc = np.asarray(res.scores)
    assert ((idx >= -1) & (idx < used)).all()
    assert (idx[:, 0] == np.arange(3)).all()        # self-retrieval
    # no-hit lanes are -1 with zero score, not phantom slot-0 entries
    assert ((idx >= 0) | (sc == 0.0)).all()
    assert np.isfinite(sc).all()
    # dead funnel lanes must NOT resurface as duplicates of a real slot
    # (ADVICE r2 high: exhausted extraction re-picked entry (0,0) and the
    # f32 rerank gave it a finite score)
    for row in idx:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live), row
    # full top-k must agree with the XLA IVF oracle (same probed buckets,
    # exact rerank — brute force over ALL rows would also see unprobed
    # buckets, which IVF approximates away by design at probe=4/16)
    cfg_x = dataclasses.replace(cfg_r, use_pallas_ivf=False)
    r_x = retrieve(cfg_x, state, q, None, 5)
    np.testing.assert_array_equal(idx, np.asarray(r_x.indices))
    np.testing.assert_allclose(sc, np.asarray(r_x.scores),
                               rtol=2e-5, atol=2e-6)


def test_overflow_annex_full_reachability(monkeypatch):
    """When real-cluster capacity < N, the spilled remainder must land in
    the reserved annex (not drop), and IVF retrieval must still find every
    row — the ~2-3% recall ceiling measured at 1M before the annex."""
    monkeypatch.setenv("AURA_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(11)
    N, D = 3800, 64
    # K=16, overprovision 1.0 -> C=256; G=4 annex -> 12 real clusters
    # (3072 slots) + 1024 annex slots: at least ~728 rows MUST be annexed
    cfg = MemoryConfig(max_memories=4096, feature_dim=64, k_centroids=16,
                       probe_centroids=4, retrieve_k=5,
                       bucket_overprovision=1.0, rebuild_lloyd_iters=2,
                       n_place_cells=8, n_grid_cells=4, n_time_cells=2)
    feats = rng.randn(N, D).astype(np.float32)
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), np.float32))
    state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))

    K, C = state.k_centroids, state.bucket_capacity
    G = min(cfg.overflow_buckets, K // 4)
    Ku = K - G
    slots_all = np.asarray(state.cluster_slot).reshape(-1)
    live = set(int(x) for x in slots_all if x >= 0)
    assert len(live) == N, f"dropped {N - len(live)} rows"
    annexed = set(int(x) for x in
                  np.asarray(state.cluster_slot[Ku:]).reshape(-1) if x >= 0)
    assert len(annexed) > 200          # annex actually used

    # self-retrieval through each IVF path, including annexed rows
    sample = sorted(annexed)[:8] + [0, 1, 2, 3]
    q = jnp.asarray(feats[np.asarray(sample)])
    for kern in ("v2", "v3", "v3r"):
        cfgk = dataclasses.replace(cfg, ivf_kernel=kern)
        res = retrieve(cfgk, state, q, None, 3)
        got = np.asarray(res.indices)[:, 0]
        assert (got == np.asarray(sample)).all(), (kern, got, sample)
