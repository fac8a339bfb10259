#!/bin/bash
# Round-3 chip work queue — sequential (the tunnel chip is single-tenant;
# concurrent jobs collide and corrupt each other's timings).
#
# Order: quick banked results first, the long flagship run last (its jsonl
# log + Orbax checkpoints are incremental, so a mid-run tunnel outage or
# round end still leaves usable evidence and a resumable checkpoint).
#
# Each job gates on tunnel liveness (the axon tunnel has a history of
# multi-hour outages) and logs to runs/.

cd /root/repo || exit 1
mkdir -p runs
Q=runs/chip_queue_r3.log
log() { echo "[$(date -u +%F\ %T)] $*" >>"$Q"; }

wait_tunnel() {
  # Poll until jax can claim the device (max ~2h), 60s between probes.
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

log "=== queue start (pid $$) ==="

# 1. Headline retrieval bench (north star; defaults = int8 coarse + XLA
#    scan, which the tile A/B of 2026-08-18 confirmed beats the Pallas
#    blockmax variants).
run_job bench_headline_r3 2400 python bench.py

# 2. Decode per-token cost attribution (VERDICT r2 #5 prep).
run_job decode_breakdown_r3 2400 python benchmarks/bench_decode_breakdown.py

# 3. Larger-than-HBM bank: 10M x 768 on one chip (VERDICT r2 #4 done-gate).
run_job host_spill_10m_r3 5400 python benchmarks/bench_host_spill.py

# 4. xl headroom preset: 1k real steps on one chip (VERDICT r2 #8).
run_job xl_1k_r3 4800 python examples/train_flagship.py \
  --preset xl --steps 1000 --batch 8 --chunk 20 \
  --grad-checkpoint --ckpt-policy dots --mu-dtype bfloat16 \
  --eval-every 250 --save-every 1000 \
  --log runs/xl_1k_r3.jsonl --checkpoint-dir /tmp/ckpt_xl_r3

# 5. Flagship 50k relaunch at the post-fix MFU (VERDICT r2 #1 done-gate:
#    steady MFU >= 0.25-0.30 with same-or-better val trajectory than
#    runs/flagship_50k.jsonl). Auto-resumes from its own checkpoints.
run_job flagship_50k_r3 17400 python examples/train_flagship.py \
  --preset full --steps 50000 --batch 16 --chunk 20 \
  --grad-checkpoint --ckpt-policy dots \
  --eval-every 500 --save-every 5000 \
  --log runs/flagship_50k_r3.jsonl --checkpoint-dir /root/ckpt_flagship_r3

log "=== queue done ==="
