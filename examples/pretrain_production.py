"""Production-style pretraining run: wake/sleep, monitoring, diagnostics.

Parity with `/root/reference/aura_nemotron_cc2_pretraining.py` (1317 LoC,
SURVEY §2.7): streaming data (HF if available, synthetic fallback —
:140-152's fallback pattern), bf16 training with wake/sleep replay +
backward replay + memory decay, `checkpoint_latest` convention, a background
monitor thread printing step/loss/ppl/memory/ETA (:596-635), generation
diagnostics with entropy/top-k-collapse analysis (:644-706), and an
OOM-catch retry (:~1114).

    python examples/pretrain_production.py --steps 500 [--preset test]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import dataclasses
import json
import math
import threading
import time


def generation_diagnostics(model, params, prompt_ids, rng):
    """Entropy / top-k mass / repetition analysis of the model's logits
    (aura_nemotron_cc2_pretraining.py:644-706 parity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    out, _ = model.apply(params, jnp.asarray(prompt_ids), use_memory=False)
    logits = out.logits[0, -1].astype(jnp.float32)
    probs = jax.nn.softmax(logits)
    logp = jax.nn.log_softmax(logits)
    entropy = float(-(probs * logp).sum())
    top5 = jax.lax.top_k(probs, 5)[0]
    diag = {
        "entropy": round(entropy, 3),
        "max_prob": round(float(probs.max()), 4),
        "top5_mass": round(float(top5.sum()), 4),
        "effective_vocab": round(math.exp(entropy), 1),
    }
    diag["collapse_warning"] = bool(diag["max_prob"] > 0.9
                                    or entropy < 1.0)
    return diag


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--preset", default="debug")
    ap.add_argument("--checkpoint-dir", default="checkpoints_prod")
    ap.add_argument("--monitor-interval", type=float, default=30.0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
    from aura_snn_rag_tpu.training.data import (
        batch_iterator, load_hf_streaming, synthesize_sequences)
    from aura_snn_rag_tpu.training.trainer import Trainer
    from aura_snn_rag_tpu.utils import get_memory_stats

    cfg = getattr(cfg_mod, f"get_{args.preset}_config")()
    cfg = cfg.replace(training=dataclasses.replace(
        cfg.training, max_steps=args.steps,
        memory_warmup_steps=max(10, args.steps // 10),
        sleep_interval=max(50, args.steps // 5),
        enable_thalamus=False))

    # data: HF streaming with synthetic fallback
    try:
        seqs = load_hf_streaming(seq_len=cfg.model.max_seq_len,
                                 max_sequences=1024)
        source = "wikitext-2 (HF streaming)"
    except ImportError:
        seqs = synthesize_sequences(cfg.model, n_sequences=512)
        source = "synthetic (HF datasets unavailable)"
    print(f"data: {source}, {seqs.shape}")

    trainer = Trainer(cfg, seed=0)
    ckpt = CheckpointManager(args.checkpoint_dir)
    start = ckpt.restore(trainer)

    state = {"step": start, "loss": float("nan"), "t0": time.time(),
             "stop": False}

    def monitor():
        while not state["stop"]:
            time.sleep(args.monitor_interval)
            done = state["step"] - start
            rate = done / max(time.time() - state["t0"], 1e-9)
            eta = (args.steps - state["step"]) / max(rate, 1e-9)
            mem = get_memory_stats()
            print(f"[monitor] step={state['step']} loss={state['loss']:.4f} "
                  f"ppl={math.exp(min(state['loss'], 20)):.1f} "
                  f"bank={trainer.hippocampus.memory_count} "
                  f"hbm={mem['bytes_in_use']/1e9:.2f}GB "
                  f"eta={eta/60:.1f}min")

    mon = threading.Thread(target=monitor, daemon=True)
    mon.start()

    it = batch_iterator(seqs, cfg.training.batch_size)
    best = float("inf")
    try:
        for step in range(start, args.steps):
            ids = next(it)
            try:
                m = trainer.train_step(ids, ids)
            except RuntimeError as e:          # OOM-catch parity
                if "RESOURCE_EXHAUSTED" in str(e) or "memory" in str(e).lower():
                    print("OOM caught — clearing caches and retrying")
                    jax.clear_caches()
                    m = trainer.train_step(ids, ids)
                else:
                    raise
            state["step"], state["loss"] = step, m["loss"]

            if step > 0 and step % cfg.training.save_steps == 0 \
                    and m["loss"] < best:
                best = m["loss"]
                ckpt.save(step, trainer, m["loss"])
            if step > 0 and step % max(1, args.steps // 4) == 0:
                diag = generation_diagnostics(
                    trainer.eval_model, trainer.state.params,
                    ids[:1, :8], jax.random.PRNGKey(step))
                print(f"[diagnostics] {json.dumps(diag)}")
    finally:
        state["stop"] = True
    ckpt.save(args.steps, trainer, state["loss"])
    print(f"final: loss={state['loss']:.4f} "
          f"bank={trainer.hippocampus.memory_count}")


if __name__ == "__main__":
    main()
