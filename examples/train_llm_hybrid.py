"""Hybrid STDP/Hebbian "LLM" training demo.

Parity with `/root/reference/src/training/train_llm.py` (155 LoC): the
gradient-free online path — hash embeddings → whitener → Oja features →
NLMS experts — combined with STDP token salience, on streamed text.

    python examples/train_llm_hybrid.py [--passes 3]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

CORPUS = [
    ("the cat sat on the mat", 0.0),
    ("dogs chase cats in the park", 0.0),
    ("the stock market rallied today", 1.0),
    ("investors bought shares of the company", 1.0),
    ("the neuron fired an action potential", 2.0),
    ("synapses strengthen with repeated activation", 2.0),
] * 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from aura_snn_rag_tpu.models.brain.brain import LiquidBrain
    from aura_snn_rag_tpu.training.online import (
        init_stdp, stdp_modulations, stdp_process_sequence)

    brain = LiquidBrain(input_dim=256, n_components=16,
                        max_components=64, n_experts=3)
    stdp = init_stdp(32000)

    errors = []
    for p in range(args.passes):
        for text, label in CORPUS:
            r = brain.learn_text(text, label)
            toks = brain.embedder.token_indices(text)
            if len(toks):
                stdp, _ = stdp_process_sequence(
                    stdp, jnp.asarray(toks)[None, :])
            errors.append(abs(r["error"]))
        print(f"pass {p}: mean|err|={np.mean(errors[-len(CORPUS):]):.3f} "
              f"K={r['K']} consciousness={r['consciousness']}")

    # token salience report
    toks = brain.embedder.token_indices("the neuron fired")
    mods = np.asarray(stdp_modulations(stdp, jnp.asarray(toks)))
    print(json.dumps({
        "final_mean_error": round(float(np.mean(errors[-6:])), 3),
        "salience('the neuron fired')": [round(float(m), 3) for m in mods],
        "predict(finance)": round(
            brain.predict_text("shares rallied strongly"), 3),
        "predict(neuro)": round(
            brain.predict_text("the synapse potentiated"), 3),
    }))


if __name__ == "__main__":
    main()
