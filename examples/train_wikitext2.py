"""WikiText-2 training with eval perplexity + checkpointing.

Parity with `/root/reference/src/training/train_wikitext2.py` (243 LoC):
GPT-2-tokenized WikiText-2 (HF, gated — synthetic fallback), train/val
split, periodic eval PPL, best-checkpoint saving.

    python examples/train_wikitext2.py --steps 1000
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import math

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--preset", default="test")
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--checkpoint-dir", default="checkpoints_wt2")
    args = ap.parse_args()

    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
    from aura_snn_rag_tpu.training.data import (
        batch_iterator, load_hf_streaming, synthesize_sequences)
    from aura_snn_rag_tpu.training.trainer import Trainer

    cfg = getattr(cfg_mod, f"get_{args.preset}_config")()
    cfg = cfg.replace(training=dataclasses.replace(
        cfg.training, max_steps=args.steps, enable_thalamus=False))

    try:
        seqs = load_hf_streaming(
            "wikitext", "wikitext-2-raw-v1", "gpt2",
            seq_len=cfg.model.max_seq_len, max_sequences=4096)
        # gpt2 vocab is 50257; clip into the model vocab
        seqs = np.clip(seqs, 0, cfg.model.vocab_size - 1)
        print(f"wikitext-2: {seqs.shape}")
    except ImportError:
        seqs = synthesize_sequences(cfg.model, n_sequences=1024)
        print(f"synthetic fallback: {seqs.shape}")

    n_val = max(8, len(seqs) // 10)
    train_seqs, val_seqs = seqs[n_val:], seqs[:n_val]

    trainer = Trainer(cfg, seed=0)
    ckpt = CheckpointManager(args.checkpoint_dir)
    start = ckpt.restore(trainer)
    it = batch_iterator(train_seqs, cfg.training.batch_size)

    best_ppl = float("inf")
    for step in range(start, args.steps):
        ids = next(it)
        m = trainer.train_step(ids, ids)
        if step % args.eval_every == 0:
            val_losses = [trainer.eval_loss(val_seqs[i:i + 8],
                                            val_seqs[i:i + 8])
                          for i in range(0, min(len(val_seqs), 32), 8)]
            val_ppl = math.exp(min(float(np.mean(val_losses)), 20))
            print(f"step {step}: train_loss={m['loss']:.4f} "
                  f"val_ppl={val_ppl:.1f}")
            if val_ppl < best_ppl:
                best_ppl = val_ppl
                ckpt.save(step, trainer, m["loss"])
    print(f"best val ppl: {best_ppl:.1f}")


if __name__ == "__main__":
    main()
