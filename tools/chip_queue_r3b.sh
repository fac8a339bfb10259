#!/bin/bash
# Round-3 chip queue, part B. Takes over from tools/chip_queue_r3.sh
# (stopped after its host_spill job): runs the flat batch-size sweep, a
# headline rerun at the sweep winner, the xl 1k-step run, then the
# flagship 50k relaunch. Sequential — the tunnel chip is single-tenant.

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

log "=== queue B start (pid $$) ==="

# Hand-off: wait for the part-A host_spill job (and its stopped parent)
# to release the chip.
for p in 10677 11985 11986; do
  while kill -0 "$p" 2>/dev/null; do sleep 20; done
done
log "part-A queue fully exited, taking over"

# 1. Flat batch-size sweep (VERDICT r2 #2: headline QPS headroom).
run_job flat_batch_sweep_r3 3000 python benchmarks/bench_flat_batch_sweep.py

# 2. Headline rerun at the sweep winner (flags derived from the sweep JSON;
#    defaults if the sweep produced nothing).
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

# 3. xl headroom preset: 1k real steps on one chip (VERDICT r2 #8).
run_job xl_1k_r3 4800 python examples/train_flagship.py \
  --preset xl --steps 1000 --batch 8 --chunk 20 \
  --grad-checkpoint --ckpt-policy dots --mu-dtype bfloat16 \
  --eval-every 250 --save-every 1000 \
  --log runs/xl_1k_r3.jsonl --checkpoint-dir /tmp/ckpt_xl_r3

# 4. Flagship 50k relaunch at the post-fix MFU (VERDICT r2 #1 done-gate).
#    Auto-resumes from its own checkpoints on restart.
run_job flagship_50k_r3 17400 python examples/train_flagship.py \
  --preset full --steps 50000 --batch 16 --chunk 20 \
  --grad-checkpoint --ckpt-policy dots \
  --eval-every 500 --save-every 5000 \
  --log runs/flagship_50k_r3.jsonl --checkpoint-dir /root/ckpt_flagship_r3

log "=== queue B done ==="
