#!/bin/bash
# Round-5 chip queue C — resumes after the VM reboot killed queue A at
# job 4 (runs/chip_queue_r5.log: hs_r5_b1024_fb32 started 09:54, 0-byte
# out). Replaces the remaining per-config host-spill jobs (each would
# re-pay the ~25 min 10M ingest) with one --sweep run against a single
# ingest, and pulls the h2d dtype probe first (it decides the ingest wire
# encoding for the driver's end-of-round bench.py run).
#
# 1. h2d_dtypes_r5:   H2D MB/s by dtype — explains the 690 s f16 ingest
#                     (f32 shipped 344 s in r4) and picks the encoding.
# 2. hs_r5_sweep:     10M B=1024, one ingest, configs:
#                     fb64r192 (clean re-measure of the default — the
#                     first r5 run compiled the Bp=1024 funnel inside the
#                     timed region), fb32r192 (VERDICT #3 done-gate),
#                     fb64r96 / fb64r64 (second-stage width: scales the
#                     transfer AND the host rerank), fb32r96.
# 3. rag_overhead_r5: per-stage RAG MFU attribution on chip (VERDICT #4).
# 4. shard_anchor_r5: one real-chip datapoint for docs/SCALING.md —
#                     per-shard-size (125k) bank QPS (VERDICT #7).
# 5/6. blockmax headline retest at B=1024 with per-query scale (the r3
#                     measurement predates it).

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

log "=== queue r5C start (pid $$) ==="

run_job h2d_dtypes_r5 1800 python benchmarks/bench_h2d_dtypes.py
run_job hs_r5_sweep 10800 \
  python benchmarks/bench_host_spill.py --batch=1024 --breakdown \
  --sweep=fb64r192,fb32r192,fb64r96,fb64r64,fb32r96
run_job rag_overhead_r5 5400 python benchmarks/bench_rag_overhead.py
run_job shard_anchor_r5 2400 python bench.py --n=125000 --batch=1024
run_job headline_blockmax_fb16_r5 3600 \
  python bench.py --flat-strategy=blockmax --flat-block-funnel=16
run_job headline_blockmax_fb32_r5 3600 \
  python bench.py --flat-strategy=blockmax --flat-block-funnel=32

log "=== queue r5C done ==="
