"""Minimal end-to-end training example (the 'v1 works' slice, SURVEY §7.4).

Trains the debug-size hippocampal transformer on synthetic data with the
full modulator stack, stores/retrieves episodic memories, and generates.

    python examples/train_tiny.py [--steps 100]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import dataclasses
import math
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--preset", default="debug")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.generation import generate
    from aura_snn_rag_tpu.training.data import (
        batch_iterator, synthesize_sequences)
    from aura_snn_rag_tpu.training.trainer import Trainer

    cfg = getattr(cfg_mod, f"get_{args.preset}_config")()
    cfg = cfg.replace(training=dataclasses.replace(
        cfg.training, max_steps=args.steps, memory_warmup_steps=20,
        enable_thalamus=False, sleep_interval=50))

    trainer = Trainer(cfg, seed=0)
    seqs = synthesize_sequences(cfg.model, n_sequences=256)
    it = batch_iterator(seqs, cfg.training.batch_size)

    t0 = time.time()
    for step in range(args.steps):
        ids = next(it)
        m = trainer.train_step(ids, ids)
        if step % 20 == 0:
            print(f"step {step}: loss={m['loss']:.4f} "
                  f"ppl={math.exp(min(m['ce'], 20)):.1f} "
                  f"mem={'on' if m['use_memory'] else 'off'} "
                  f"bank={trainer.hippocampus.memory_count}")
    dt = time.time() - t0
    tok_s = args.steps * cfg.training.batch_size * cfg.model.max_seq_len / dt
    print(f"trained {args.steps} steps in {dt:.1f}s ({tok_s:.0f} tok/s)")

    out = generate(trainer.eval_model, trainer.state.params,
                   jnp.asarray(seqs[:1, :8], jnp.int32), 16,
                   jax.random.PRNGKey(0))
    print("generated:", np.asarray(out[0, 8:]).tolist())


if __name__ == "__main__":
    main()
