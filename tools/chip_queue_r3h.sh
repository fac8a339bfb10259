#!/bin/bash
# Round-3 chip queue, part H — clean B=2048 headline point.
#
# The batch sweep was still rising at B=1024 (50.2k -> 56.1k from 512 ->
# 1024) and the queue-E B=2048 probe ran while the rerank default was 384
# (29.2k, not comparable). This measures B=2048 at the current defaults
# (128-wide rerank, bf16 funnel). If it beats 56.2k, flip the bench
# serving-batch default and re-validate with a plain `python bench.py`.

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

log "=== queue H start (pid $$) ==="

GPID=$(cat /tmp/chip_queue_r3g.pid 2>/dev/null)
while [ -n "$GPID" ] && kill -0 "$GPID" 2>/dev/null; do sleep 60; done
log "queue G exited, taking over"

run_job headline_b2048_rerank128 1800 python bench.py --batch=2048

log "=== queue H done ==="
