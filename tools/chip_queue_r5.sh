#!/bin/bash
# Round-5 chip queue — VERDICT r4 measurement items, in risk order.
#
# 1. bench_smoke_r5:    --small validation of the new bench paths on chip
#                       (f16 ingest, device-side 1k-query ground truth,
#                       per-query-scaled kernel) before burning long runs.
# 2. headline_r5:       the official 1M headline with the hardened recall
#                       eval (>=1024 queries vs device-exact) and f16
#                       ingest (VERDICT #5/#6).
# 3. hs_r5_b1024:       the 10M B=1024 host-spill number the round-4 OOM
#                       blocked (VERDICT #2) — chunked funnel + per-query
#                       scale, with --breakdown attribution.
# 4. hs_r5_b1024_fb32:  funnel-width A/B (VERDICT #3 done-gate: 32-block
#                       recall with per-query scale >= round-4's 64-block
#                       0.9984).
# 5. rag_overhead_r5:   per-stage RAG MFU attribution on chip (VERDICT #4).
# 6. shard_anchor_r5:   one real-chip datapoint for the docs/SCALING.md
#                       roofline — per-shard-size (125k) bank QPS at the
#                       headline serving batch (VERDICT #7).

cd /root/repo || exit 1
mkdir -p runs
Q=runs/chip_queue_r5.log
log() { echo "[$(date -u +%F\ %T)] $*" >>"$Q"; }

wait_tunnel() {
  for i in $(seq 1 120); do
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    log "tunnel down (probe $i), retrying in 60s"
    sleep 60
  done
  return 1
}

run_job() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  log "JOB $name: waiting for tunnel"
  wait_tunnel || { log "JOB $name: tunnel never came back, skipping"; return 1; }
  log "JOB $name: start: $*"
  timeout "$tmo" "$@" >"runs/${name}.out" 2>"runs/${name}.err"
  local rc=$?
  log "JOB $name: exit $rc"
  return $rc
}

log "=== queue r5 start (pid $$) ==="

run_job bench_smoke_r5 1800 python bench.py --small
run_job headline_r5 3600 python bench.py
run_job hs_r5_b1024 7200 \
  python benchmarks/bench_host_spill.py --batch=1024 --breakdown
run_job hs_r5_b1024_fb32 7200 \
  python benchmarks/bench_host_spill.py --batch=1024 --funnel-blocks=32
run_job rag_overhead_r5 5400 python benchmarks/bench_rag_overhead.py
run_job shard_anchor_r5 2400 python bench.py --n=125000 --batch=1024

log "=== queue r5 done ==="
