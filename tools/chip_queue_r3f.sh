#!/bin/bash
# Round-3 chip queue, part F — post-defaults-validation probes.
#
# 1/2. End-to-end blockmax headline attempt at the B=1024 serving batch:
#      the reworked kernel WINS the isolated coarse stage (s8-native
#      tile=2048: 4.60 ms vs XLA 6.30 ms, runs/flat_kernel_ab_v2.out);
#      with --flat-block-funnel=16 the rerank funnel is 128 rows/query —
#      identical to the scan default — so the old 512-row gather penalty
#      is gone. If it beats 56.2k, flip the engine default.
# 3/4. Host-spill attribution: the 10M pipeline runs at 1.79 s/batch but
#      the host rerank itself measures ~90 ms offline — --breakdown
#      separates dispatch/device/transfer/rerank; --funnel-blocks=16
#      quarters the funnel traffic if transfer-bound.

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

log "=== queue F start (pid $$) ==="

run_job headline_blockmax_fb16 2400 \
  python bench.py --flat-strategy=blockmax --flat-block-funnel=16
run_job headline_blockmax_fb16_t2048 2400 \
  python bench.py --flat-strategy=blockmax --flat-block-funnel=16 --flat-tile-m=2048
run_job hs_breakdown_10m 4200 \
  python benchmarks/bench_host_spill.py --breakdown
run_job hs_funnel16_10m 4200 \
  python benchmarks/bench_host_spill.py --breakdown --funnel-blocks=16

log "=== queue F done ==="
