"""RAG-conditioned generation demo on the trained flagship checkpoint.

Loads the latest flagship checkpoint (examples/train_flagship.py output),
one-shot-memorizes a support passage, then generates continuations with
and without episodic memory — the reference's `one_shot_memorize_and_
generate` flow (colab_l4_training.py:225-254) on real trained weights.

    python examples/flagship_demo.py --checkpoint-dir /root/data/ckpt_flagship
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", default="/root/data/ckpt_flagship")
    ap.add_argument("--corpus", default="/root/data/corpus")
    ap.add_argument("--preset", default="full")
    ap.add_argument("--max-new-tokens", type=int, default=48)
    args = ap.parse_args()

    import jax
    import numpy as np
    from tokenizers import Tokenizer

    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.services.one_shot import (
        one_shot_memorize_and_generate)
    from aura_snn_rag_tpu.generation import generate as gen_fn
    from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
    from aura_snn_rag_tpu.training.trainer import Trainer

    tok = Tokenizer.from_file(os.path.join(args.corpus, "tokenizer.json"))
    with open(os.path.join(args.corpus, "meta.json")) as f:
        meta = json.load(f)

    cfg = getattr(cfg_mod, f"get_{args.preset}_config")()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, vocab_size=meta["vocab_size"], dropout=0.0),
        # must match the training run's modulator flags so the checkpoint
        # tree structure lines up (train_flagship.py sets thalamus off)
        training=dataclasses.replace(cfg.training, enable_thalamus=False))
    trainer = Trainer(cfg, seed=0)
    step = CheckpointManager(args.checkpoint_dir).restore(trainer)
    print(f"restored step {step}, "
          f"{trainer.hippocampus.memory_count} memories", flush=True)

    model = trainer.eval_model
    params = trainer.state.params

    support = ("def fibonacci(n):\n"
               "    \"\"\"Return the n-th Fibonacci number iteratively.\"\"\"\n"
               "    a, b = 0, 1\n"
               "    for _ in range(n):\n"
               "        a, b = b, a + b\n"
               "    return a\n")
    prompt = "def fibonacci(n):\n"

    sup_ids = np.asarray(tok.encode(support).ids, np.int32)
    pr_ids = np.asarray(tok.encode(prompt).ids, np.int32)

    mid, out_mem = one_shot_memorize_and_generate(
        model, params, trainer.hippocampus, sup_ids, pr_ids,
        max_new_tokens=args.max_new_tokens, temperature=0.7)
    txt_mem = tok.decode([int(t) for t in np.asarray(out_mem[0])])

    out_plain = gen_fn(model, params,
                       np.asarray(pr_ids)[None, :], args.max_new_tokens,
                       jax.random.PRNGKey(0), temperature=0.7,
                       use_memory=False)
    txt_plain = tok.decode([int(t) for t in np.asarray(out_plain[0])])

    print(f"\nmemory id: {mid}")
    print(f"\n--- with episodic memory ---\n{txt_mem}")
    print(f"\n--- without memory ---\n{txt_plain}")
    print(json.dumps({"demo": "one_shot_memorize_and_generate",
                      "checkpoint_step": step,
                      "with_memory_chars": len(txt_mem),
                      "without_memory_chars": len(txt_plain)}))


if __name__ == "__main__":
    main()
