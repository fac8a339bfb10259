"""Flat-retrieval batch-size sweep: find the throughput-optimal serving batch.

The flat scan is bank-read-bound: every dispatch reads the full coarse bank
(~768 MB int8 @ 1M x 768) regardless of how many queries ride on it, so QPS
should scale with the query batch until compute or the funnel-score traffic
takes over. The round-2 headline used B=128 (24.8k QPS sustained); the
roofline (bank read ~0.94 ms at 820 GB/s) says a larger batch should land
multiples higher. Reference math being amortized: the brute-force branch of
/root/reference/src/core/hippocampal.py:245-319 (one Python-loop query at a
time there; batched one-pass scan here).

Sweeps the FULL engine path (`memory.retrieve_flat`: coarse scan -> funnel
-> exact f32 rerank) over query batch x strategy:

  - scan/f32      : [B, M] coarse scores + approx_max_k funnel (default)
  - scan/bf16     : same, bf16 funnel scores (halves [B, M] traffic)
  - blockmax      : streaming Pallas kernel, no [B, M] materialization
  - blockmax-xla  : same funnel math in XLA (kernel force-disabled)

Each variant reports sustained QPS (16 in-flight dispatches, host fence at
the end — single-dispatch latency is tracked separately by
bench_retrieval_latency.py) and recall@10 vs exact numpy ground truth on 64
queries. Emits one JSON line per variant plus a winner summary to stdout
and runs/flat_batch_sweep_r3.json.

Run on chip:  python benchmarks/bench_flat_batch_sweep.py [--small]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

SMALL = "--small" in sys.argv
N = 100_000 if SMALL else 1_000_000
D = 768
TOPK = 10
N_BATCHES = 4 if SMALL else 16
N_EVAL = 32 if SMALL else 64
BATCHES = (64, 128) if SMALL else (128, 256, 512, 1024)
OUT_PATH = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), "runs", "flat_batch_sweep_r3.json")


def make_data(n, d, n_centers=1024, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, d).astype(np.float32) * 2.0
    assign = rng.randint(0, n_centers, n)
    return centers[assign] + rng.randn(n, d).astype(np.float32)


def exact_topk_numpy(feats, queries, k):
    fn = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
    qn = queries / (np.linalg.norm(queries, axis=1, keepdims=True) + 1e-12)
    out = np.zeros((len(queries), k), np.int64)
    for i in range(0, len(queries), 8):
        cos = qn[i:i + 8] @ fn.T
        out[i:i + 8] = np.argpartition(-cos, k, axis=1)[:, :k]
    return out


def recall_at_k(approx, exact):
    return float(np.mean([
        len(set(a.tolist()) & set(e.tolist())) / exact.shape[1]
        for a, e in zip(approx, exact)]))


def main():
    import jax
    import jax.numpy as jnp
    from aura_snn_rag_tpu.config import MemoryConfig
    from aura_snn_rag_tpu.memory import init_memory_state, retrieve_flat
    from aura_snn_rag_tpu.memory import engine as engine_mod
    from aura_snn_rag_tpu.memory.engine import bulk_load

    feats = make_data(N, D)
    rng = np.random.RandomState(1)
    max_b = max(BATCHES)
    pick = rng.randint(0, N, max_b * N_BATCHES)
    queries = feats[pick] + 0.5 * rng.randn(len(pick), D).astype(np.float32)
    exact = exact_topk_numpy(feats, queries[:N_EVAL], TOPK)

    base_kw = dict(max_memories=N, feature_dim=D, retrieve_k=TOPK,
                   coarse_dtype="int8",
                   n_place_cells=16, n_grid_cells=8, n_time_cells=4)

    # one shared bank, loaded once (state is config-agnostic for the
    # flat-path knobs being swept)
    cfg0 = MemoryConfig(**base_kw)
    state = bulk_load(cfg0, init_memory_state(cfg0), jnp.asarray(feats),
                      jnp.zeros((N, 2), jnp.float32))
    q_dev = jnp.asarray(queries)

    real_kernel_ok = engine_mod._flat_kernel_ok
    variants = [
        ("scan/f32", dict(flat_strategy="scan", flat_score_dtype="f32"),
         real_kernel_ok),
        ("scan/bf16", dict(flat_strategy="scan", flat_score_dtype="bf16"),
         real_kernel_ok),
        ("blockmax", dict(flat_strategy="blockmax"), real_kernel_ok),
        # distinct flat_tile_m => distinct static-config jit cache entry, so
        # the kernel_ok monkeypatch is seen at (re)trace time; the XLA
        # fallback path never reads flat_tile_m
        ("blockmax-xla", dict(flat_strategy="blockmax", flat_tile_m=2048),
         lambda *a, **k: False),
    ]

    rows = []
    for B in BATCHES:
        batches = [q_dev[i * B:(i + 1) * B] for i in range(N_BATCHES)]
        for name, kw, kernel_ok in variants:
            cfg = MemoryConfig(**base_kw, **kw)
            engine_mod._flat_kernel_ok = kernel_ok
            try:
                res = retrieve_flat(cfg, state, batches[0], None, TOPK)
                idx0 = np.asarray(res.indices)          # warm + fence
                t0 = time.perf_counter()
                results = [retrieve_flat(cfg, state, b, None, TOPK)
                           for b in batches]
                np.asarray(results[-1].indices)          # host fence
                dt = time.perf_counter() - t0
            except Exception as e:  # OOM at large B is a data point
                engine_mod._flat_kernel_ok = real_kernel_ok
                print(json.dumps({"variant": name, "batch": B,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
                continue
            engine_mod._flat_kernel_ok = real_kernel_ok
            qps = N_BATCHES * B / dt
            n_eval = min(N_EVAL, B)
            rec = recall_at_k(idx0[:n_eval], exact[:n_eval])
            row = {"variant": name, "batch": B, "qps": round(qps, 1),
                   "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
                   "recall_at_10": round(rec, 4)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    ok = [r for r in rows if r["recall_at_10"] >= 0.999]
    winner = max(ok or rows, key=lambda r: r["qps"]) if rows else None
    summary = {"winner": winner, "rows": rows, "n_vectors": N}
    print(json.dumps({"winner": winner}), flush=True)
    with open(OUT_PATH, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
