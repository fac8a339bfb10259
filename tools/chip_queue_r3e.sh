#!/bin/bash
# Round-3 chip queue, part E — final headline tuning after part D.
#
# 1. B=2048 probe: the B-sweep curve was still rising at 1024 (52.0k f32 /
#    56.1k bf16); one more doubling tells us whether the scan has gone
#    compute-bound.
# 2. Defaults validation: plain `python bench.py` exactly as the driver
#    will run it at round end (warms the persistent compile cache for that
#    invocation too).

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

log "=== queue E start (pid $$) ==="

# Hand-off: wait for queue D (pid 16287) to fully exit.
while kill -0 16287 2>/dev/null; do sleep 60; done
log "queue D exited, taking over"

run_job bench_headline_b2048 1800 python bench.py --batch=2048
run_job bench_headline_defaults 1800 python bench.py

log "=== queue E done ==="
