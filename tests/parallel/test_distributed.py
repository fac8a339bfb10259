"""Multi-host launcher seam tests (SURVEY §2.8 launcher row, VERDICT r1 #7).

The single-process path must no-op cleanly; the real seam is exercised by
spawning TWO actual Python processes that form a JAX distributed group over
localhost (CPU backend), build a global mesh spanning both, assemble a
global array from process-local batches, and psum across the process
boundary — the DCN-crossing pattern of a pod run, simulated in CI.
"""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from aura_snn_rag_tpu.parallel import distributed as dist


class TestSingleProcess:
    def test_initialize_noop(self):
        assert dist.initialize() is False
        assert not dist.is_multiprocess()

    def test_global_mesh_covers_all_devices(self):
        mesh = dist.global_mesh(n_model=2)
        assert mesh.shape["model"] == 2
        assert mesh.shape["data"] * 2 == len(jax.devices())

    def test_local_batch_slice_full(self):
        assert dist.local_batch_slice(32) == slice(0, 32)


_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2")

    sys.path.insert(0, {repo!r})
    from aura_snn_rag_tpu.parallel import distributed as dist
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    pid = int(sys.argv[1])
    multi = dist.initialize(coordinator_address={coord!r},
                            num_processes=2, process_id=pid)
    assert multi, "expected a 2-process group"
    assert jax.process_count() == 2

    mesh = dist.global_mesh(n_model=1)
    assert mesh.shape["data"] == len(jax.devices())

    # per-process local batch -> global sharded array -> global psum
    global_batch = 8
    sl = dist.local_batch_slice(global_batch)
    full = np.arange(global_batch, dtype=np.float32)[:, None]
    local = full[sl]
    garr = dist.make_global_array(local, mesh)
    assert garr.shape == (8, 1)

    @jax.jit
    def total(x):
        return x.sum()

    t = float(total(garr))
    assert t == float(full.sum()), (t, float(full.sum()))
    print(f"proc {{pid}} OK total={{t}}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
class TestTwoProcessGroup:
    def test_two_process_mesh_and_collective(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        coord = f"127.0.0.1:{_free_port()}"
        script = tmp_path / "worker.py"
        script.write_text(_WORKER.format(repo=repo, coord=coord))

        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env) for pid in (0, 1)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("distributed workers timed out")
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
            assert f"proc {pid} OK" in out
