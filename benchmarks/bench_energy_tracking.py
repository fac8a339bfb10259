"""Energy accounting benchmark: spiking vs dense pJ estimates for the
SNN FFN (parity with /root/reference/benchmarks/bench_energy_tracking.py)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json

import jax
import jax.numpy as jnp


def main():
    from aura_snn_rag_tpu.ops.neurons import gif_params, gif_scan
    from aura_snn_rag_tpu.utils.energy import EnergyTracker

    tracker = EnergyTracker()
    p = gif_params(levels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 256))
    spikes, _ = gif_scan(p, x)
    tracker.record("gif_layer", spikes, fan_out=256)

    lif_spikes = (jax.random.uniform(jax.random.PRNGKey(1),
                                     (8, 16, 256)) < 0.1).astype(jnp.float32)
    tracker.record("sparse_lif_layer", lif_spikes, fan_out=256)

    report = tracker.energy_pj()
    summary = tracker.summary()
    print(json.dumps({
        "per_component": {k: {kk: round(vv, 2) for kk, vv in v.items()}
                          for k, v in report.items()},
        "summary": {k: round(v, 2) for k, v in summary.items()},
    }))


if __name__ == "__main__":
    main()
