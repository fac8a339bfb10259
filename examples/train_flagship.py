"""Flagship-scale training on the offline corpus (VERDICT r1 #1).

Trains a full-preset (271M-class) or test/medium-preset model on the real
on-disk corpus built by tools/build_offline_corpus.py, recording the
loss/PPL trajectory at the reference's checkpoints (1k/5k/10k —
/root/reference/docs/TRAINING_OPTIMIZATION.md:198-204), tokens/s, and MFU.

Network egress is zero in this environment, so the corpus is ~470 MB of
on-disk Python source + English prose (see the builder's docstring) with a
32k byte-level BPE — a real, natural-statistics corpus, documented as the
WikiText substitute.

    python examples/train_flagship.py --preset full --steps 10000 \
        --corpus /root/data/corpus --log runs/flagship.jsonl
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import math
import os
import time

import numpy as np

# v5e peak bf16 matmul throughput per chip
V5E_PEAK_FLOPS = 197e12


def count_params(params) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="full")
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--corpus", default="/root/data/corpus")
    ap.add_argument("--batch", type=int, default=0,
                    help="override preset batch size")
    ap.add_argument("--chunk", type=int, default=20,
                    help="train steps per device dispatch")
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--save-every", type=int, default=2500)
    ap.add_argument("--log", default="runs/flagship.jsonl")
    ap.add_argument("--checkpoint-dir", default="checkpoints_flagship")
    ap.add_argument("--seq-len", type=int, default=0,
                    help="override preset max_seq_len")
    ap.add_argument("--grad-checkpoint", action="store_true")
    ap.add_argument("--ckpt-policy", default="full",
                    help="remat policy: full | dots (save MXU outputs, "
                         "recompute only elementwise work)")
    ap.add_argument("--mu-dtype", default="",
                    help="AdamW first-moment dtype override (e.g. bfloat16 "
                         "frees ~0.9 GB for B=32 on one v5e chip)")
    ap.add_argument("--memory-warmup", type=int, default=-1,
                    help="override memory_warmup_steps (0 = RAG live from "
                         "step 0; useful for short throughput probes)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (sitecustomize pins the TPU platform "
                         "via jax config, so env JAX_PLATFORMS is ignored)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
    from aura_snn_rag_tpu.training.data import TokenStream
    from aura_snn_rag_tpu.training.trainer import Trainer

    with open(os.path.join(args.corpus, "meta.json")) as f:
        meta = json.load(f)

    cfg = getattr(cfg_mod, f"get_{args.preset}_config")()
    model_kw = dict(vocab_size=meta["vocab_size"])
    if args.seq_len:
        model_kw["max_seq_len"] = args.seq_len
    if args.grad_checkpoint:
        model_kw["use_gradient_checkpointing"] = True
        model_kw["gradient_checkpoint_policy"] = args.ckpt_policy
    train_kw = dict(max_steps=args.steps,
                    # thalamic veto off for unattended long runs: with a
                    # fresh model the gate clamps low and silently disables
                    # memory (same choice the r1 e2e run made)
                    enable_thalamus=False,
                    # likewise the hormone memory veto: accuracy=exp(-loss)
                    # saturates near 0 at converged LM loss, so the gate
                    # would shut episodic memory off permanently mid-run
                    # (hormone LR scaling stays active)
                    endocrine_memory_gating=False)
    if args.batch:
        train_kw["batch_size"] = args.batch
    if args.mu_dtype:
        train_kw["optimizer_mu_dtype"] = args.mu_dtype
    if args.memory_warmup >= 0:
        train_kw["memory_warmup_steps"] = args.memory_warmup
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, **model_kw),
        training=dataclasses.replace(cfg.training, **train_kw))

    L = cfg.model.max_seq_len
    B = cfg.training.batch_size
    train = TokenStream(os.path.join(args.corpus, "train.npy"), L, seed=0)
    val = TokenStream(os.path.join(args.corpus, "val.npy"), L, seed=1)
    print(f"corpus: {train.n_tokens/1e6:.1f}M train / "
          f"{val.n_tokens/1e6:.1f}M val tokens, vocab {meta['vocab_size']}",
          flush=True)

    trainer = Trainer(cfg, seed=0)
    n_params = count_params(trainer.state.params)
    flops_per_tok = 6 * n_params
    print(f"model: {n_params/1e6:.1f}M params, B={B}, L={L}, "
          f"chunk={args.chunk}", flush=True)

    ckpt = CheckpointManager(args.checkpoint_dir)
    if ckpt.manager.latest_step() is not None:
        # Execute ONE throwaway chunk before restoring: the train step's
        # temp arenas get carved out of clean HBM first. Restoring ~3.6 GB
        # of state before the first execution fragments the space and the
        # arena reservation OOMs on one v5e chip (resume-only failure;
        # cold starts are unaffected). The warmup update is discarded by
        # the restore, and the chunk length must match --chunk so the same
        # compiled program is exercised.
        warm = train.sample_chunk(args.chunk, B)
        trainer.train_chunk(warm, warm)
        print("pre-restore arena warmup done", flush=True)
    start = ckpt.restore(trainer)
    os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
    logf = open(args.log, "a", buffering=1)

    def run_eval():
        losses = []
        for batch in val.eval_batches(8, max_batches=8):
            losses.append(trainer.eval_loss(batch, batch))
        l = float(np.mean(losses))
        return l, math.exp(min(l, 20.0))

    step = start
    t_start = time.time()
    tokens_done = 0
    while step < args.steps:
        n = min(args.chunk, args.steps - step)
        chunk = train.sample_chunk(n, B)
        t0 = time.time()
        m = trainer.train_chunk(chunk, chunk)
        dt = time.time() - t0
        step += n
        tokens = n * B * L
        tokens_done += tokens
        tok_s = tokens / dt
        mfu = flops_per_tok * tok_s / V5E_PEAK_FLOPS
        rec = {"step": step, "loss": m["loss"], "ce": m["ce"],
               "ppl": math.exp(min(m["ce"], 20.0)),
               "tok_s": round(tok_s), "mfu": round(mfu, 4),
               "mem_count": int(trainer.hippocampus.memory_count),
               "elapsed_s": round(time.time() - t_start)}
        if step % args.eval_every < n:
            rec["val_loss"], rec["val_ppl"] = run_eval()
        logf.write(json.dumps(rec) + "\n")
        print(rec, flush=True)
        if step % args.save_every < n or step >= args.steps:
            ckpt.save(step, trainer, m["loss"])
            print(f"checkpoint @ {step}", flush=True)

    avg_tok_s = tokens_done / (time.time() - t_start)
    final = {"final": True, "steps": step, "avg_tok_s": round(avg_tok_s),
             "avg_mfu": round(flops_per_tok * avg_tok_s / V5E_PEAK_FLOPS, 4),
             "n_params": n_params}
    final["val_loss"], final["val_ppl"] = run_eval()
    logf.write(json.dumps(final) + "\n")
    print(final, flush=True)


if __name__ == "__main__":
    main()
