#!/bin/bash
# Round-3 chip queue, part C — replaces A/B after the host_spill query-gen
# fix (the original bench regenerated a 262k-row chunk PER QUERY and could
# not finish inside its timeout). Sequential: the tunnel chip is
# single-tenant.
#
# Jobs: host_spill 10M -> flat batch-size sweep -> headline rerun at the
# sweep winner -> xl 1k-step run -> flagship 50k relaunch.

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

log "=== queue C start (pid $$) ==="

# 1. Larger-than-HBM bank: 10M x 768 on one chip (VERDICT r2 #4 done-gate).
run_job host_spill_10m_r3 5400 python benchmarks/bench_host_spill.py

# 2. Flat batch-size sweep (VERDICT r2 #2: headline QPS headroom).
run_job flat_batch_sweep_r3 3000 python benchmarks/bench_flat_batch_sweep.py

# 3. Headline rerun at the sweep winner.
FLAGS=$(python - <<'EOF'
import json
try:
    w = json.load(open("runs/flat_batch_sweep_r3.json"))["winner"]
    flags = [f"--batch={w['batch']}"]
    v = w["variant"]
    if v == "scan/bf16":
        flags.append("--flat-score=bf16")
    elif v.startswith("blockmax"):
        flags.append("--flat-strategy=blockmax")
    print(" ".join(flags))
except Exception:
    print("")
EOF
)
log "headline rerun flags: '$FLAGS'"
run_job bench_headline_r3b 2400 python bench.py $FLAGS

# 4. xl headroom preset: 1k real steps on one chip (VERDICT r2 #8).
run_job xl_1k_r3 4800 python examples/train_flagship.py \
  --preset xl --steps 1000 --batch 8 --chunk 20 \
  --grad-checkpoint --ckpt-policy dots --mu-dtype bfloat16 \
  --eval-every 250 --save-every 1000 \
  --log runs/xl_1k_r3.jsonl --checkpoint-dir /tmp/ckpt_xl_r3

# 5. Flagship 50k relaunch at the post-fix MFU (VERDICT r2 #1 done-gate).
#    Auto-resumes from its own checkpoints on restart.
run_job flagship_50k_r3 17400 python examples/train_flagship.py \
  --preset full --steps 50000 --batch 16 --chunk 20 \
  --grad-checkpoint --ckpt-policy dots \
  --eval-every 500 --save-every 5000 \
  --log runs/flagship_50k_r3.jsonl --checkpoint-dir /root/ckpt_flagship_r3

log "=== queue C done ==="
