"""Train the emotion/personality multi-task head on labeled text.

Parity with `/root/reference/scripts/train_emotion_head.py` (211 LoC):
trains EmotionPersonalityHead on (text, emotion/intent/tone/personality)
rows from a JSONL file (or a synthetic set), using hash-embedded features.

    python examples/train_emotion_head.py [--data rows.jsonl] [--epochs 10]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json

import numpy as np

SYNTHETIC = [
    ("i am so happy today", 0, 3, 1, 0),
    ("this makes me furious", 2, 3, 2, 1),
    ("could you explain the theorem", 7, 1, 0, 2),
    ("run the report now", 7, 2, 2, 3),
    ("i love this design", 0, 3, 1, 0),
    ("that is terrifying news", 3, 0, 2, 4),
    ("let us meet for coffee", 6, 4, 1, 2),
    ("the results are disappointing", 1, 0, 0, 1),
] * 8


def load_rows(path):
    rows = []
    with open(path, encoding="utf-8", errors="ignore") as f:
        for line in f:
            try:
                r = json.loads(line)
                rows.append((r["text"], r.get("emotion", -1),
                             r.get("intent", -1), r.get("tone", -1),
                             r.get("personality", -1)))
            except (json.JSONDecodeError, KeyError):
                continue
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from aura_snn_rag_tpu.encoders import FastHashEmbedder
    from aura_snn_rag_tpu.models.emotion_head import (
        EmotionHeadConfig, EmotionPersonalityHead, emotion_multitask_loss)

    rows = load_rows(args.data) if args.data else SYNTHETIC
    embedder = FastHashEmbedder(dim=256)
    X = jnp.asarray(embedder.embed_batch([r[0] for r in rows]))
    labels = {k: jnp.asarray([r[i + 1] for r in rows])
              for i, k in enumerate(("emotion", "intent", "tone",
                                     "personality"))}

    head = EmotionPersonalityHead(EmotionHeadConfig(d_model=256),
                                  deterministic=True)
    params = head.init(jax.random.PRNGKey(0), X[:1])
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = head.apply(p, X)
            return emotion_multitask_loss(logits, labels)
        (loss, per_task), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)
        if epoch % 5 == 0:
            print(f"epoch {epoch}: loss={float(loss):.4f}")

    logits = head.apply(params, X)
    acc = float((logits["emotion"].argmax(-1) == labels["emotion"]).mean())
    print(f"final emotion accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
