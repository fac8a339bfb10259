"""Manual spiking diagnostic: drive each neuron model across input levels
and report firing-rate curves.

Parity with `/root/reference/src/tools/neuron_firing_diag.py`.

    python tools/neuron_firing_diag.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json

import jax.numpy as jnp


def main():
    from aura_snn_rag_tpu.ops.izhikevich_presets import (
        IZHIKEVICH_PRESETS, get_preset)
    from aura_snn_rag_tpu.ops.neurons import (
        adex_params, adex_scan, gif_params, gif_scan, izhikevich_scan,
        lif_params, lif_scan)

    report = {}
    drives = [0.1, 0.5, 1.0, 2.0, 5.0, 10.0]

    for drive in drives:
        x = jnp.ones((1, 200, 8)) * drive
        lif, _ = lif_scan(lif_params(8), x)
        gif, _ = gif_scan(gif_params(levels=8), x)
        report.setdefault("lif", {})[str(drive)] = float(lif.mean())
        report.setdefault("gif", {})[str(drive)] = float(gif.mean())
        izh, _ = izhikevich_scan(get_preset("regular_spiking"), x * 3)
        report.setdefault("izhikevich_rs", {})[str(drive)] = \
            float(izh.mean())
        adx, _ = adex_scan(adex_params(), x * 8)
        report.setdefault("adex", {})[str(drive)] = float(adx.mean())

    # pattern comparison at fixed drive
    x = jnp.ones((1, 400, 1)) * 10.0
    patterns = {}
    for name in list(IZHIKEVICH_PRESETS)[:8]:
        s, _ = izhikevich_scan(get_preset(name), x)
        patterns[name] = float(s.sum())
    report["izhikevich_pattern_spike_counts"] = patterns

    print(json.dumps(report, indent=2))
    # sanity flags
    for model, curve in report.items():
        if isinstance(curve, dict) and all(
                isinstance(v, float) and v == 0.0 for v in curve.values()):
            print(f"WARNING: {model} silent across all drives")


if __name__ == "__main__":
    main()
