#!/bin/bash
# Round-3 chip queue, part D — runs after part C's flagship 50k.
#
# 1-2. Headline funnel A/B at B=1024/bf16: widen the exact-rerank funnel
#      (and raise the approx_max_k recall target) to recover recall@10 =
#      1.00 lost to int8-coarse near-ties (55.2k QPS @ 0.9969 as measured).
# 3.   Host-spill 10M retry (the [M,1] metadata-operand OOM is fixed by
#      the kernel layout rework).
# 4.   Flat kernel tile A/B rerun with the reworked layout (the old
#      kernel paid ~1 GB of relayout copies per call).
# 5.   Decode breakdown at the full (flagship) preset.

cd /root/repo || exit 1
mkdir -p runs
Q=runs/chip_queue_r3.log
log() { echo "[$(date -u +%F\ %T)] $*" >>"$Q"; }

wait_tunnel() {
  for i in $(seq 1 120); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
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

log "=== queue D start (pid $$) ==="

# Hand-off: wait for queue C (pid 13826) to fully exit.
while kill -0 13826 2>/dev/null; do sleep 60; done
log "queue C exited, taking over"

run_job bench_headline_rerank384 1800 python bench.py \
  --batch=1024 --flat-score=bf16 --rerank=384
run_job bench_headline_rerank384_r99 1800 python bench.py \
  --batch=1024 --flat-score=bf16 --rerank=384 --flat-recall=0.99
run_job host_spill_10m_r3 5400 python benchmarks/bench_host_spill.py
run_job flat_kernel_ab_v2 2400 python benchmarks/bench_flat_kernel.py
run_job decode_breakdown_full 2400 python benchmarks/bench_decode_breakdown.py \
  --preset full

log "=== queue D done ==="
