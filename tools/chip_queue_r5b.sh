#!/bin/bash
# Round-5 chip queue B — runs after queue A (tools/chip_queue_r5.sh).
#
# 1/2. Blockmax end-to-end headline retest at B=1024: round 3 measured the
#      kernel LOSING end-to-end (41.7k @ recall 0.895 at a 16-block
#      funnel) because int8 near-tie rescue was weak — queries were
#      globally scaled then. With per-query max-abs scale (round 5) the
#      coarse ordering is ~7x less noisy, so a narrow block funnel may now
#      hold recall at the kernel's bandwidth advantage (no [B, M]
#      materialization: the XLA scan writes+rereads a 2 GB bf16 score
#      matrix per 1024-batch; the kernel's surface is 500 MB of block
#      maxima).
# 3/4. Host-spill second-stage width probe at the queue-A winner's block
#      funnel: rows=96/64 scale the device->host transfer AND the host
#      rerank gather (the projected B=1024 bottleneck) ~2-3x down.

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

log "=== queue r5B start (pid $$) ==="

run_job h2d_dtypes_r5 1800 python benchmarks/bench_h2d_dtypes.py
# clean re-measure of the default 10M config with the full-batch warmup
# (the first r5 run compiled the Bp=1024 funnel inside the timed region)
run_job hs_r5_b1024_clean 7200 \
  python benchmarks/bench_host_spill.py --batch=1024 --breakdown
run_job headline_blockmax_fb16_r5 3600 \
  python bench.py --flat-strategy=blockmax --flat-block-funnel=16
run_job headline_blockmax_fb32_r5 3600 \
  python bench.py --flat-strategy=blockmax --flat-block-funnel=32
run_job hs_r5_b1024_rows96 7200 \
  python benchmarks/bench_host_spill.py --batch=1024 --funnel-rows=96 --breakdown
run_job hs_r5_b1024_rows64 7200 \
  python benchmarks/bench_host_spill.py --batch=1024 --funnel-rows=64 --breakdown

log "=== queue r5B done ==="
