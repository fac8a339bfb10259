"""Prosody visualization: salience/gain curves and channel traces → PNG.

Parity with `/root/reference/scripts/visualize_prosody.py` (324 LoC).

    python scripts/visualize_prosody.py [--out prosody.png]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="prosody.png")
    ap.add_argument("--seq-len", type=int, default=128)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from aura_snn_rag_tpu.models.prosody import (
        prosody_attention_gains, prosody_channels_from_tokens)

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 32000, (1, args.seq_len)))
    amp, pitch, boundary = prosody_channels_from_tokens(ids)
    gains, info = prosody_attention_gains(ids)

    fig, axes = plt.subplots(3, 1, figsize=(12, 8), sharex=True)
    t = np.arange(args.seq_len)
    axes[0].plot(t, np.asarray(amp[0]), label="amplitude", lw=1)
    axes[0].plot(t, np.asarray(pitch[0]), label="pitch", lw=1)
    axes[0].plot(t, np.asarray(boundary[0]), label="boundary", lw=1)
    axes[0].set_ylabel("channels")
    axes[0].legend(loc="upper right", fontsize=8)

    axes[1].plot(t, np.asarray(info["salience"][0]), color="tab:purple")
    winners = np.asarray(info["winners"][0])
    axes[1].scatter(winners, np.asarray(info["salience"][0])[winners],
                    color="tab:red", s=18, zorder=3, label="winners")
    axes[1].set_ylabel("salience")
    axes[1].legend(loc="upper right", fontsize=8)

    axes[2].plot(t, np.asarray(gains[0]), color="tab:green")
    axes[2].axhline(float(info["mu_scalar"][0]), ls="--", color="gray",
                    label=f"mu={float(info['mu_scalar'][0]):.2f}")
    axes[2].set_ylabel("attention gain")
    axes[2].set_xlabel("token position")
    axes[2].legend(loc="upper right", fontsize=8)

    fig.suptitle("Prosody spiking-salience pipeline")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
