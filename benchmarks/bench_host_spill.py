"""Host-spilled bank benchmark: 10M x 768 rows on ONE chip.

VERDICT r2 #4: "larger-than-HBM episodic bank ... Done = a 10M x 768 bench
row with recall@10 >= 0.99 and a QPS number". The reference caps at 100k
GPU-resident rows and names O(n^2) its scaling ceiling
(/root/reference/README.md:39, TODO.md:12); this measures the memory-
hierarchy split (int8 coarse in HBM + exact f32 rows in host RAM,
memory/host_spill.py) at 100x that scale.

    python benchmarks/bench_host_spill.py [--small]   # --small: 1M rows

Prints ONE JSON line: {"n_vectors", "qps", "recall_at_10", "ingest_s", ...}.
Ground truth = exact cosine top-k over ALL rows, computed chunkwise on host.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

SMALL = "--small" in sys.argv
N = next((int(a.split("=", 1)[1]) for a in sys.argv
          if a.startswith("--n=")), 1_000_000 if SMALL else 10_000_000)
D = 768
TOPK = 10
# Serving batch per device-funnel dispatch. The funnel is bank-read-bound
# (7.3 GB int8 at 10M rows), so the batch amortizes the read exactly like
# the device-resident headline path (--batch=1024 there): --batch=1024
QUERY_BATCH = next((int(a.split("=", 1)[1]) for a in sys.argv
                    if a.startswith("--batch=")), 128)
# --batches widens the measured stream (more in-flight batches = closer
# to steady-state pipeline throughput; at B=1024 the default stream is
# only 2 batches, so dispatch/drain edges weigh ~half the measurement)
N_QUERY_BATCHES = next(
    (int(a.split("=", 1)[1]) for a in sys.argv
     if a.startswith("--batches=")),
    max(2, (1024 if SMALL else 2048) // QUERY_BATCH))
N_EVAL = 256         # queries scored against exact ground truth (2560
                     # items: resolves the fb32-vs-fb64 recall A/B;
                     # ~80 s of host matmul at 10M rows)
N_CENTERS = 4096
CHUNK = 262_144
# Per-stage attribution of the retrieve_stream pipeline (device funnel /
# device->host transfer / host rerank), printed before the JSON line:
BREAKDOWN = "--breakdown" in sys.argv
# Funnel width A/B: blocks of 8 rows reranked per query (default 64 = 512
# rows; 16 = 128 rows matches the device-resident scan's default funnel).
FUNNEL_BLOCKS = next((int(a.split("=", 1)[1]) for a in sys.argv
                      if a.startswith("--funnel-blocks=")), 64)
# Second-stage row funnel width (config.spill_funnel_rows): the device
# keeps only this many exact-coarse-rescored rows per query — the knob
# that scales BOTH the device->host transfer and the host-rerank gather.
FUNNEL_ROWS = next((int(a.split("=", 1)[1]) for a in sys.argv
                    if a.startswith("--funnel-rows=")), None)
# One-ingest multi-config sweep: --sweep=fb64r192,fb32r192,fb64r96qc512
# runs every (flat_block_funnel, spill_funnel_rows[, spill_query_chunk])
# combo against the SAME ingested bank (ingest is ~25 min at 10M on the
# tunnel; each config re-measure alone would re-pay it). One JSON line
# per config.
SWEEP = next((a.split("=", 1)[1].split(",") for a in sys.argv
              if a.startswith("--sweep=")), None)


def _parse_sweep_item(item):
    # "fb64r192" -> (64, 192, None); "fb64r192qc512" -> (64, 192, 512)
    fb, rest = item[2:].split("r")
    qc = None
    if "qc" in rest:
        rest, qc = rest.split("qc")
        qc = int(qc)
    return int(fb), int(rest), qc


def chunk_factory(seed0=0):
    """Deterministic clustered rows, generated per chunk (never the full
    f32 bank twice on host)."""
    rng0 = np.random.RandomState(seed0)
    centers = (rng0.randn(N_CENTERS, D).astype(np.float32) * 2.0)

    def make(offset, b):
        rng = np.random.RandomState(1000 + offset)
        assign = rng.randint(0, N_CENTERS, b)
        return centers[assign] + rng.randn(b, D).astype(np.float32)

    return make


def main():
    import jax  # noqa: F401 (backend init)
    from aura_snn_rag_tpu.config import MemoryConfig
    from aura_snn_rag_tpu.memory.host_spill import SpilledBank

    rows_kw = {} if FUNNEL_ROWS is None else {
        "spill_funnel_rows": FUNNEL_ROWS}
    cfg = MemoryConfig(
        max_memories=N, feature_dim=D, retrieve_k=TOPK,
        coarse_dtype="int8", flat_block_funnel=FUNNEL_BLOCKS,
        # unused index knobs kept tiny (the spilled bank is flat-funnel)
        k_centroids=16, n_place_cells=8, n_grid_cells=4, n_time_cells=2,
        **rows_kw)
    bank = SpilledBank(cfg)
    make = chunk_factory()

    t0 = time.perf_counter()
    bank.bulk_load_chunked(make, N, chunk=CHUNK)
    np.asarray(bank.dev.strength[:1])                     # device fence
    ingest_s = time.perf_counter() - t0

    # queries: perturbed copies of real rows. Rows come off the bank's own
    # host-resident f32 store — regenerating a 262k-row chunk per query
    # (the naive `make(base, CHUNK)[off - base]`) costs ~3 s x 2048 queries
    # and would dwarf the measurement itself.
    rngq = np.random.RandomState(7)
    n_q = QUERY_BATCH * N_QUERY_BATCHES
    q_off = rngq.randint(0, max(1, N - CHUNK), n_q)
    queries = bank.host_features[q_off].astype(np.float32).copy()
    queries += 0.5 * rngq.randn(n_q, D).astype(np.float32)

    # sustained QPS: pipelined batches (device funnels overlap host rerank)
    batches = [queries[i * QUERY_BATCH:(i + 1) * QUERY_BATCH]
               for i in range(N_QUERY_BATCHES)]

    def measure(bank):
        """(qps, results, breakdown-json-or-None) at bank.config."""
        # warm/compile at the FULL batch shape: the funnel program is
        # keyed by the padded batch Bp — an 8-query warmup compiles the
        # Bp=128 program and leaves the Bp=QUERY_BATCH (chunked) compile
        # inside the timed region (~20 s of remote compile: the round-5
        # first 10M B=1024 run read 79.6 QPS this way while its own
        # per-stage breakdown measured a ~1.5k QPS pipeline)
        bank.retrieve(batches[0])
        t0 = time.perf_counter()
        # coalesce pinned to the dispatch batch so --batch is the one knob
        results = bank.retrieve_stream(batches, coalesce=QUERY_BATCH)
        qps = n_q / (time.perf_counter() - t0)
        breakdown = None
        if BREAKDOWN:
            # Per-stage attribution. Dispatch is async, so "device" is
            # fenced with a 1-element transfer of the LAST output;
            # "transfer" then pulls the full funnel arrays; "rerank"
            # reruns the host math on the already-transferred operands.
            t0 = time.perf_counter()
            inflight = [bank._dispatch_funnel(b) for b in batches]
            dispatch_s = time.perf_counter() - t0
            np.asarray(inflight[-1][2][:1, :1])            # device fence
            device_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            pulled = [np.asarray(f) for _, _, f in inflight]
            transfer_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for (qn_b, B, _), f in zip(inflight, pulled):
                bank._host_rerank(qn_b, B, f, TOPK, None)
            rerank_s = time.perf_counter() - t0
            breakdown = {
                "breakdown_per_batch_ms": {
                    "dispatch": round(dispatch_s / len(batches) * 1e3, 1),
                    "device_funnel": round(device_s / len(batches) * 1e3, 1),
                    "transfer": round(transfer_s / len(batches) * 1e3, 1),
                    "host_rerank": round(rerank_s / len(batches) * 1e3, 1),
                },
                "funnel_bytes_per_batch": pulled[0].nbytes,
                "funnel_blocks": bank.config.flat_block_funnel,
                "funnel_rows": bank.config.spill_funnel_rows,
                "n_vectors": N,
            }
        return qps, results, breakdown

    def exact_ground_truth():
        # exact cosine top-k, chunkwise over the host f32 bank
        qn = queries[:N_EVAL] / (np.linalg.norm(
            queries[:N_EVAL], axis=1, keepdims=True) + 1e-12)
        best_v = np.full((N_EVAL, TOPK), -1e30, np.float32)
        best_i = np.zeros((N_EVAL, TOPK), np.int64)
        for off in range(0, N, CHUNK):
            rows = bank.host_features[off:off + CHUNK]
            rn = rows / (np.linalg.norm(rows, axis=1, keepdims=True)
                         + 1e-12)
            cos = qn @ rn.T                                # [E, chunk]
            merged_v = np.concatenate([best_v, cos], axis=1)
            merged_i = np.concatenate(
                [best_i, np.arange(off, off + rows.shape[0])[None, :]
                 .repeat(N_EVAL, 0)], axis=1)
            pick = np.argpartition(-merged_v, TOPK - 1, axis=1)[:, :TOPK]
            best_v = np.take_along_axis(merged_v, pick, axis=1)
            best_i = np.take_along_axis(merged_i, pick, axis=1)
        return best_i

    def report(qps, results, breakdown, best_i):
        if breakdown is not None:
            print(json.dumps(breakdown), flush=True)
        got = np.concatenate([r.indices for r in results])[:N_EVAL]
        recall = float(np.mean([
            len(set(g.tolist()) & set(e.tolist())) / TOPK
            for g, e in zip(got, best_i)]))
        hbm_gb = N * D / 2**30 + N * 8 / 2**30            # int8 + metadata
        host_gb = N * D * 4 / 2**30
        print(json.dumps({
            "metric": f"host-spilled retrieval QPS @ {N} vectors",
            "value": round(qps, 1), "unit": "queries/s",
            "recall_at_10": round(recall, 4),
            "ingest_s": round(ingest_s, 1),
            "n_vectors": N, "coarse_dtype": "int8",
            "batch": QUERY_BATCH,
            "funnel_blocks": bank.config.flat_block_funnel,
            "funnel_rows": bank.config.spill_funnel_rows,
            "query_chunk": bank.config.spill_query_chunk,
            "hbm_resident_gb": round(hbm_gb, 2),
            "host_resident_gb": round(host_gb, 2),
        }), flush=True)

    best_i = exact_ground_truth()
    if SWEEP is None:
        qps, results, breakdown = measure(bank)
        report(qps, results, breakdown, best_i)
        return
    import dataclasses
    for item in SWEEP:
        fb, rows, qc = _parse_sweep_item(item)
        qc_kw = {} if qc is None else {"spill_query_chunk": qc}
        bank.config = dataclasses.replace(
            bank.config, flat_block_funnel=fb, spill_funnel_rows=rows,
            **qc_kw)
        qps, results, breakdown = measure(bank)
        report(qps, results, breakdown, best_i)


if __name__ == "__main__":
    main()
