"""Prosody modulation sweep: baseline vs prosody-modulated SNN per preset.

Parity with the reference's two prosody studies:
- /root/reference/scripts/benchmark_prosody.py:95-242 — baseline SNN
  (Synapsis->GIF) vs prosody-modulated SNN per attention preset, measuring
  total spikes, average spike rate, inference time, winner ratio, and
  attention entropy;
- /root/reference/scripts/tune_prosody_hyperparameters.py:120-193 — the
  7-config hyperparameter grid (k_winners x channel weights x smoothing x
  normalization x gain), measuring winner utilization and salience shape.

The TPU build measures the same quantities on jitted lax.scan chains
instead of per-timestep Python loops; "spike efficiency" here is the
energy proxy the reference uses (fewer spikes at equal gain = cheaper on
neuromorphic targets, bench_energy_tracking.py converts to pJ).

Usage: python benchmarks/bench_prosody_sweep.py [--json]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _entropy(p: np.ndarray) -> float:
    p = p / (p.sum() + 1e-8)
    return float(-np.sum(p * np.log(p + 1e-8)))


def main():
    from aura_snn_rag_tpu.models.prosody import (
        SWEEP_CONFIGS, prosody_attention_gains, prosody_gif_scan)
    from aura_snn_rag_tpu.ops.neurons import gif_params

    rng = np.random.RandomState(0)
    B, T, D_IN, D_H = 8, 64, 64, 128
    N_RUNS = 10
    token_ids = jnp.asarray(rng.randint(0, 32000, (B, T)))
    x = jnp.asarray(rng.randn(B, T, D_IN).astype(np.float32))
    # synapsis-style spike-aware linear (std = 1/sqrt(fan_in·rate),
    # ref synapsis.py:78)
    w = jnp.asarray(rng.randn(D_IN, D_H).astype(np.float32)
                    / np.sqrt(D_IN * 0.1))
    params = gif_params(levels=16)

    @jax.jit
    def baseline_fwd(xx):
        h = xx @ w
        spikes, _ = prosody_gif_scan(params, h, None)
        return spikes

    def make_prosody_fwd(cfg):
        @jax.jit
        def fwd(ids, xx):
            gains, info = prosody_attention_gains(ids, cfg)
            h = xx @ w
            spikes, _ = prosody_gif_scan(params, h, gains,
                                         modulation_strength=0.5)
            return spikes, info
        return fwd

    def timed(fn, *args):
        out = fn(*args)                     # compile
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(N_RUNS):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][:1])
        return out, (time.perf_counter() - t0) / N_RUNS * 1e3

    rows = []
    spikes, base_ms = timed(baseline_fwd, x)
    base_spikes = float(jnp.sum(spikes))
    rows.append({
        "config": "no_prosody_baseline", "total_spikes": base_spikes,
        "avg_spike_rate": base_spikes / spikes.size,
        "inference_ms": round(base_ms, 3),
        "spike_ratio_vs_baseline": 1.0,
        "winner_utilization": None, "attention_entropy": None,
        "mean_gain": 1.0,
    })

    for name, cfg in SWEEP_CONFIGS.items():
        fwd = make_prosody_fwd(cfg)
        (spikes, info), ms = timed(fwd, token_ids, x)
        tot = float(jnp.sum(spikes))
        sal = np.asarray(info["salience"])
        winners = np.asarray(info["winners"])
        # winner utilization: fraction of the k slots holding a genuinely
        # salient token (salience > half the row max) — the reference's
        # "winners found vs target k" metric
        wsal = np.take_along_axis(sal, winners, axis=1)
        util = float((wsal > 0.5 * sal.max(axis=1, keepdims=True)).mean())
        gains, _ = prosody_attention_gains(token_ids, cfg)
        rows.append({
            "config": name, "total_spikes": tot,
            "avg_spike_rate": tot / spikes.size,
            "inference_ms": round(ms, 3),
            "spike_ratio_vs_baseline": round(tot / base_spikes, 4),
            "winner_utilization": round(util, 4),
            "attention_entropy": round(
                float(np.mean([_entropy(s) for s in sal])), 4),
            "mean_gain": round(float(jnp.mean(gains)), 4),
        })

    as_json = "--json" in _sys.argv
    if as_json:
        print(json.dumps({"benchmark": "prosody_sweep", "rows": rows}))
        return rows
    hdr = (f"{'config':24s} {'spikes':>10s} {'rate':>7s} {'ms':>8s} "
           f"{'vs_base':>8s} {'util':>6s} {'entropy':>8s} {'gain':>6s}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['config']:24s} {r['total_spikes']:10.0f} "
              f"{r['avg_spike_rate']:7.4f} {r['inference_ms']:8.3f} "
              f"{r['spike_ratio_vs_baseline']:8.4f} "
              f"{(r['winner_utilization'] if r['winner_utilization'] is not None else float('nan')):6.3f} "
              f"{(r['attention_entropy'] if r['attention_entropy'] is not None else float('nan')):8.4f} "
              f"{r['mean_gain']:6.3f}")
    return rows


if __name__ == "__main__":
    main()
