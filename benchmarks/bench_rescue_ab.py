"""Flat-funnel A/B at 1M×768 on chip: recall@10 + QPS per variant.

Loads the bank ONCE, computes exact ground truth ONCE (host), then times
`retrieve_flat` across funnel variants at the headline serving batch:

- approx_max_k recall_target sweep (the measured miss source: funnel
  slack, ~0.35% of top-10 items dropped at the 0.95 default),
- the EXACT block-max funnel (flat_exact_funnel: provable containment,
  zero slack — residual misses are int8 rank inflation only),
- rerank width interactions,
- the (rejected) near-tie rescue, kept for the record.

The VERDICT r3 #2 done-gate: recall >= 0.999 at <= 20% QPS cost.

    python benchmarks/bench_rescue_ab.py [--small]

Prints one JSON line per variant.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import sys
import time

import numpy as np

SMALL = "--small" in sys.argv
N = 100_000 if SMALL else 1_000_000
D = 768
TOPK = 10
QUERY_BATCH = 32 if SMALL else 1024
N_QUERY_BATCHES = 8 if SMALL else 16
N_EVAL = 256            # recall resolution: 2560 scored items
# (name, config overrides)
VARIANTS = [
    ("approx95_kk128", {}),
    ("approx97_kk128", {"flat_funnel_recall": 0.97}),
    ("approx98_kk128", {"flat_funnel_recall": 0.98}),
    ("exact_kk128", {"flat_exact_funnel": True}),
    ("exact_kk192", {"flat_exact_funnel": True, "rerank_candidates": 192}),
    ("exact_kk256", {"flat_exact_funnel": True, "rerank_candidates": 256}),
    ("approx95_kk192", {"rerank_candidates": 192}),
    ("wide1024_kk128", {"flat_wide_funnel": 1024}),
    ("wide2048_kk160", {"flat_wide_funnel": 2048, "rerank_candidates": 160}),
    ("wide2048_kk192", {"flat_wide_funnel": 2048, "rerank_candidates": 192}),
    ("wide4096_kk192", {"flat_wide_funnel": 4096, "rerank_candidates": 192}),
]
# --wide-only: skip the already-measured first seven variants
if "--wide-only" in sys.argv:
    VARIANTS = VARIANTS[7:]


def main():
    import jax
    import jax.numpy as jnp
    from aura_snn_rag_tpu.config import MemoryConfig
    from aura_snn_rag_tpu.memory import init_memory_state, retrieve_flat
    from aura_snn_rag_tpu.memory.engine import bulk_load

    rng = np.random.RandomState(0)
    centers = rng.randn(1024, D).astype(np.float32) * 2.0
    feats = centers[rng.randint(0, 1024, N)] + rng.randn(N, D).astype(
        np.float32)
    rngq = np.random.RandomState(1)
    pick = rngq.randint(0, N, QUERY_BATCH * N_QUERY_BATCHES)
    queries = feats[pick] + 0.5 * rngq.randn(len(pick), D).astype(np.float32)

    base = MemoryConfig(
        max_memories=N, feature_dim=D, k_centroids=64, probe_centroids=8,
        retrieve_k=TOPK, coarse_dtype="int8", flat_score_dtype="bf16",
        n_place_cells=16, n_grid_cells=8, n_time_cells=4)
    state = init_memory_state(base)
    state = bulk_load(base, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), jnp.float32))

    # exact ground truth once (chunked f32 cosine on host)
    qn = queries[:N_EVAL] / (np.linalg.norm(
        queries[:N_EVAL], axis=1, keepdims=True) + 1e-12)
    fn = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
    exact = np.zeros((N_EVAL, TOPK), np.int64)
    for i in range(0, N_EVAL, 16):
        cos = qn[i:i + 16] @ fn.T
        part = np.argpartition(-cos, TOPK, axis=1)[:, :TOPK]
        row = cos[np.arange(len(part))[:, None], part]
        order = np.argsort(-row, axis=1)
        exact[i:i + 16] = part[np.arange(len(part))[:, None], order]
    del fn

    q = jnp.asarray(queries)
    batches = [q[i * QUERY_BATCH:(i + 1) * QUERY_BATCH]
               for i in range(N_QUERY_BATCHES)]

    for name, kw in VARIANTS:
        cfg = dataclasses.replace(base, **kw)
        res0 = retrieve_flat(cfg, state, batches[0], None, TOPK)  # compile
        np.asarray(res0.indices)
        t0 = time.perf_counter()
        results = [retrieve_flat(cfg, state, b, None, TOPK)
                   for b in batches]
        np.asarray(results[-1].indices)
        qps = (N_QUERY_BATCHES * QUERY_BATCH) / (time.perf_counter() - t0)
        got = np.concatenate([np.asarray(r.indices) for r in results])
        recall = float(np.mean([
            len(set(a.tolist()) & set(e.tolist())) / TOPK
            for a, e in zip(got[:N_EVAL], exact)]))
        print(json.dumps({
            "variant": name,
            "qps": round(qps, 1), "recall_at_10": round(recall, 5),
            "n_vectors": N, "batch": QUERY_BATCH,
        }), flush=True)


if __name__ == "__main__":
    main()
