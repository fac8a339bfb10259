#!/bin/bash
# Round-5 chip queue D — final measurement: steady-state 10M host-spill
# at the new spill_funnel_rows=96 default. The r5C sweep measured 2-batch
# streams (dispatch/drain edges weigh ~half the window); --batches=8
# approximates steady serving. qc512 probes halving the funnel's
# sequential bank passes (4 -> 2) at a 2.4 GB block-max temp.

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

log "=== queue r5D start (pid $$) ==="

run_job hs_r5_steady 10800 \
  python benchmarks/bench_host_spill.py --batch=1024 --batches=8 \
  --breakdown --sweep=fb64r96,fb64r64,fb64r96qc512

log "=== queue r5D done ==="
