"""int8 coarse flat-scan path: quantized bank read + exact f32 rerank.

The int8 coarse scores are ~0.3%-noisy; the rerank funnel must absorb that
so final top-k matches the bf16 path's (both rerank in exact f32)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory import init_memory_state, retrieve_flat
from aura_snn_rag_tpu.memory.engine import bulk_load, write_memories


def _cfg(**kw):
    return MemoryConfig(max_memories=2048, feature_dim=64, k_centroids=16,
                        probe_centroids=4, retrieve_k=5, n_place_cells=8,
                        n_grid_cells=4, n_time_cells=2, **kw)


def test_int8_flat_matches_bf16_topk():
    rng = np.random.RandomState(0)
    feats = rng.randn(2048, 64).astype(np.float32)
    q = jnp.asarray(feats[:8] + 0.1 * rng.randn(8, 64).astype(np.float32))

    results = {}
    for dt in ("bf16", "int8"):
        cfg = _cfg(coarse_dtype=dt)
        st = init_memory_state(cfg)
        assert st.features_nb16.dtype == (jnp.int8 if dt == "int8"
                                          else jnp.bfloat16)
        st = bulk_load(cfg, st, jnp.asarray(feats),
                       jnp.zeros((2048, 2), np.float32))
        results[dt] = retrieve_flat(cfg, st, q, None, 5)

    np.testing.assert_array_equal(np.asarray(results["int8"].indices),
                                  np.asarray(results["bf16"].indices))
    np.testing.assert_allclose(np.asarray(results["int8"].scores),
                               np.asarray(results["bf16"].scores),
                               rtol=1e-5)


def test_int8_write_path_roundtrip():
    cfg = _cfg(coarse_dtype="int8")
    st = init_memory_state(cfg)
    rng = np.random.RandomState(1)
    f = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    st = write_memories(cfg, st, f, jnp.zeros((16, 2)))
    # quantized rows reconstruct the normalized vectors to ~scale/254
    # (per-row max-abs quantization: dequant = q * coarse_scale / 127)
    fn = np.asarray(f) / np.linalg.norm(np.asarray(f), axis=1, keepdims=True)
    scale = np.asarray(st.coarse_scale[:16])[:, None]
    np.testing.assert_allclose(scale[:, 0],
                               np.abs(fn).max(axis=1), rtol=1e-6)
    got = np.asarray(st.features_nb16[:16], np.float32) * scale / 127.0
    assert np.abs(got - fn).max() < (0.5 / 127) * scale.max() * 1.01
    # per-row scaling must beat the old global-127 bound by ~1/max|fn|
    assert np.abs(got - fn).max() < 0.5 / 127
    # and self-retrieval works through the quantized coarse scan
    res = retrieve_flat(cfg, st, f[:4], None, 3)
    np.testing.assert_array_equal(np.asarray(res.indices)[:, 0],
                                  np.arange(4))


def test_bf16_score_chain_matches_f32_topk():
    """flat_score_dtype='bf16' halves the [B, M] funnel traffic; the exact
    f32 rerank must make the final top-k identical to the f32 chain."""
    rng = np.random.RandomState(2)
    feats = rng.randn(2048, 64).astype(np.float32)
    q = jnp.asarray(feats[:8] + 0.1 * rng.randn(8, 64).astype(np.float32))

    results = {}
    for dt in ("f32", "bf16"):
        cfg = _cfg(flat_score_dtype=dt)
        st = init_memory_state(cfg)
        st = bulk_load(cfg, st, jnp.asarray(feats),
                       jnp.zeros((2048, 2), np.float32))
        results[dt] = retrieve_flat(cfg, st, q, None, 5)

    np.testing.assert_array_equal(np.asarray(results["bf16"].indices),
                                  np.asarray(results["f32"].indices))
    np.testing.assert_allclose(np.asarray(results["bf16"].scores),
                               np.asarray(results["f32"].scores), rtol=1e-5)


def test_bf16_score_chain_with_locations():
    """Spatial term rides the bf16 chain too; ranking must still follow
    proximity on cosine ties and match the f32 chain."""
    rng = np.random.RandomState(3)
    N, D = 1024, 64
    v = rng.randn(D).astype(np.float32)
    feats = rng.randn(N, D).astype(np.float32)
    feats[10] = v
    feats[20] = v
    locs = rng.randn(N, 2).astype(np.float32) * 10
    locs[10] = (9.0, 9.0)
    locs[20] = (0.1, 0.1)
    q = jnp.asarray(v)[None, :]
    qloc = jnp.asarray([[0.0, 0.0]], jnp.float32)

    idxs = {}
    for dt in ("f32", "bf16"):
        cfg = _cfg(flat_score_dtype=dt)
        st = init_memory_state(cfg)
        st = bulk_load(cfg, st, jnp.asarray(feats), jnp.asarray(locs))
        idxs[dt] = np.asarray(retrieve_flat(cfg, st, q, qloc, 5).indices)
    np.testing.assert_array_equal(idxs["bf16"], idxs["f32"])
    row = list(idxs["bf16"][0])
    assert row.index(20) < row.index(10)


def test_per_row_scale_cuts_coarse_noise():
    """The per-row max-abs scale must cut int8 coarse-cos error several-fold
    vs the global-127 convention. At the production D=768, components of an
    L2-normalized row are ~1/sqrt(768)~0.036 and the row max-abs ~0.15, so
    the global 127 scale uses only ~1/7 of the int8 range."""
    from aura_snn_rag_tpu.memory.engine import _coarse_cos, _l2norm

    rng = np.random.RandomState(7)
    D = 768
    feats = rng.randn(1024, D).astype(np.float32)
    q = jnp.asarray(_l2norm(jnp.asarray(
        rng.randn(16, D).astype(np.float32))))

    cfg = dataclasses.replace(_cfg(coarse_dtype="int8"),
                              max_memories=1024, feature_dim=D)
    st = bulk_load(cfg, init_memory_state(cfg), jnp.asarray(feats),
                   jnp.zeros((1024, 2), np.float32))
    exact = np.asarray(jnp.einsum(
        "bd,md->bm", q,
        _l2norm(jnp.asarray(feats)).astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST))

    scaled = np.asarray(_coarse_cos(st.features_nb16, q, st.coarse_scale))
    # global-convention coarse rows for comparison
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    g8 = jnp.asarray(np.clip(np.round(fn * 127.0), -127, 127), jnp.int8)
    legacy = np.asarray(_coarse_cos(g8, q, None))

    err_scaled = np.abs(scaled - exact).mean()
    err_legacy = np.abs(legacy - exact).mean()
    assert err_scaled * 4 < err_legacy, (err_scaled, err_legacy)
    assert err_scaled < 1e-3, err_scaled
