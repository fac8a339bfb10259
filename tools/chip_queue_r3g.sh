#!/bin/bash
# Round-3 chip queue, part G — host-spill serving-batch amortization.
#
# The device funnel over the 10M x 768 int8 bank (7.3 GB) is a full bank
# read per dispatch; B=1024 amortizes it 8x vs the original B=128 (the
# same lever that took the device-resident headline 26k -> 56k QPS).
# Runs with the dynamic_update_slice ingest path (ingest_s comparable).

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

log "=== queue G start (pid $$) ==="

# Hand-off: wait for queue F to fully exit.
FPID=$(cat /tmp/chip_queue_r3f.pid 2>/dev/null)
while [ -n "$FPID" ] && kill -0 "$FPID" 2>/dev/null; do sleep 60; done
log "queue F exited, taking over"

run_job hs_b1024_10m 4200 \
  python benchmarks/bench_host_spill.py --batch=1024 --breakdown

log "=== queue G done ==="
