#!/bin/sh
# Two-process distributed demo on one machine (CPU backend) — the same
# launcher seam a TPU pod uses (parallel/distributed.py): process 0 is the
# coordinator; each process contributes its local devices to one global
# mesh, loads its own slice of the global batch, and the psum crosses the
# process boundary. On a real pod, replace the env vars with the pod
# metadata (or omit them — jax auto-detects) and run one process per host.
#
#   sh examples/run_multihost_cpu.sh
set -e
COORD=127.0.0.1:45123
REPO="$(cd "$(dirname "$0")/.." && pwd)"

run_worker() {
  AURA_COORDINATOR=$COORD AURA_NUM_PROCESSES=2 AURA_PROCESS_ID=$1 \
  python - <<PYEOF
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, "$REPO")
import numpy as np
from aura_snn_rag_tpu.parallel import distributed as dist

multi = dist.initialize()
pid = jax.process_index()
mesh = dist.global_mesh(n_model=1)
sl = dist.local_batch_slice(8)
local = np.arange(8, dtype=np.float32)[sl, None]
garr = dist.make_global_array(local, mesh)
total = float(jax.jit(lambda x: x.sum())(garr))
print(f"process {pid}: mesh={dict(mesh.shape)} global_sum={total}",
      flush=True)
assert total == 28.0
PYEOF
}

run_worker 1 &
W1=$!
run_worker 0
wait $W1
echo "multihost demo OK"
