"""RAG-live vs memory-off MFU attribution (VERDICT r3 #4).

The flagship probe measures MFU 0.363 memory-off vs 0.332 RAG-live at the
full preset. This bench splits that gap into its parts on ONE chip:

- step time memory-off (the 6·N·tokens denominator both MFU numbers use),
- step time RAG-live without episodic writes (pure retrieval overhead:
  12 MemoryAugmentedLayers × one batched retrieve over the 100k bank),
- step time RAG-live with writes (the store-every-10-steps amortized cost),
- the ISOLATED retrieval and write programs, timed alone, plus their
  analytic HBM-byte cost — so "overhead" can be labeled real work
  (bandwidth-bound bank scans) vs scheduling loss.

    python benchmarks/bench_rag_overhead.py [--steps 30] [--batch 16]

Prints ONE JSON line. Reference baseline: the reference cannot run this
comparison at all (single-GPU, no MFU instrumentation; SURVEY §5.1).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import sys
import time

import numpy as np

STEPS = next((int(a.split("=", 1)[1]) for a in sys.argv
              if a.startswith("--steps=")), 30)
BATCH = next((int(a.split("=", 1)[1]) for a in sys.argv
              if a.startswith("--batch=")), 16)
# v5e peak is 197 TFLOPS bf16 (394 is the int8 TOPS figure) — must match
# examples/train_flagship.py so MFUs are comparable across runs. The
# first chip run of this bench (runs/rag_overhead_r5.out) divided by
# 394e12: its mfu_* fields are exactly 2x too low (0.1844 -> 0.369).
V5E_PEAK_FLOPS = 197e12          # bf16


def main():
    import jax
    import jax.numpy as jnp

    from aura_snn_rag_tpu.config import get_full_config
    from aura_snn_rag_tpu.memory import engine
    from aura_snn_rag_tpu.training.trainer import Trainer

    def count_params(params):
        return sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params))

    full = get_full_config()
    full = full.replace(
        model=dataclasses.replace(full.model,
                                  use_gradient_checkpointing=True,
                                  gradient_checkpoint_policy="dots"),
        training=dataclasses.replace(
            full.training, batch_size=BATCH, memory_warmup_steps=0,
            enable_thalamus=False, optimizer_mu_dtype="bfloat16",
            metrics_fetch_interval=10))

    trainer = Trainer(full, seed=0)
    n_params = count_params(trainer.state.params)
    L = full.model.max_seq_len
    tokens_per_step = BATCH * L
    flops_per_step = 6 * n_params * tokens_per_step

    # seed the bank so retrieval scans a realistic active row count
    rng = np.random.RandomState(0)
    seed_feats = rng.randn(80_000, full.memory.feature_dim).astype(np.float32)
    trainer.hippocampus.state = engine.bulk_load(
        full.memory, trainer.hippocampus.state, jnp.asarray(seed_feats),
        jnp.zeros((80_000, 2), np.float32))

    ids = rng.randint(0, full.model.vocab_size, (BATCH, L)).astype(np.int32)

    def timed_steps(use_memory, store_memory, n=STEPS):
        fn = trainer._get_step_fn(use_memory, store_memory)
        args = lambda: (trainer.state, trainer.hippocampus.state,
                        jnp.asarray(ids), jnp.asarray(ids),
                        jnp.ones(()), jax.random.PRNGKey(1),
                        trainer.amygdala_params, trainer.thalamus_params)
        s, ms, m = fn(*args())                       # compile + warm
        np.asarray(m)
        trainer.state, trainer.hippocampus.state = s, ms
        t0 = time.perf_counter()
        for _ in range(n):
            trainer.state, trainer.hippocampus.state, m = fn(
                trainer.state, trainer.hippocampus.state,
                jnp.asarray(ids), jnp.asarray(ids), jnp.ones(()),
                jax.random.PRNGKey(2), trainer.amygdala_params,
                trainer.thalamus_params)
        np.asarray(m)                                # host fence
        return (time.perf_counter() - t0) / n

    t_off = timed_steps(False, False)
    t_rag = timed_steps(True, False)
    t_rag_store = timed_steps(True, True)

    # isolated retrieval: the 12 per-layer retrievals the RAG step adds
    n_rag_layers = full.model.num_layers
    q = jnp.asarray(rng.randn(BATCH, full.memory.feature_dim)
                    .astype(np.float32))

    @jax.jit
    def retrieval_only(ms, q):
        outs = []
        for _ in range(n_rag_layers):
            outs.append(engine.retrieve_auto(
                full.memory, ms, q, None, full.model.num_retrieved).scores)
        return jnp.stack(outs).sum()

    np.asarray(retrieval_only(trainer.hippocampus.state, q))   # compile
    t0 = time.perf_counter()
    for _ in range(10):
        r = retrieval_only(trainer.hippocampus.state, q)
    np.asarray(r)
    t_retr = (time.perf_counter() - t0) / 10

    # isolated write of one [B, D] batch
    wfeats = jnp.asarray(rng.randn(BATCH, full.memory.feature_dim)
                         .astype(np.float32))
    wl = jnp.zeros((BATCH, 2), jnp.float32)
    ms2 = engine.write_memories(full.memory, trainer.hippocampus.state,
                                wfeats, wl)          # compile
    np.asarray(ms2.count)
    t0 = time.perf_counter()
    for _ in range(10):
        ms2 = engine.write_memories(full.memory, ms2, wfeats, wl)
    np.asarray(ms2.count)
    t_write = (time.perf_counter() - t0) / 10

    mfu = lambda t: flops_per_step / t / V5E_PEAK_FLOPS
    # analytic HBM bytes of retrieval work (bf16 clustered scan per layer)
    active = 80_000
    retr_bytes = (n_rag_layers * active * full.memory.feature_dim * 2)

    print(json.dumps({
        "metric": "RAG overhead attribution (full preset, one chip)",
        "n_params": n_params, "batch": BATCH, "seq_len": L,
        "step_ms_memory_off": round(t_off * 1e3, 2),
        "step_ms_rag_no_store": round(t_rag * 1e3, 2),
        "step_ms_rag_store": round(t_rag_store * 1e3, 2),
        "mfu_memory_off": round(mfu(t_off), 4),
        "mfu_rag_no_store": round(mfu(t_rag), 4),
        "mfu_rag_store_every_step": round(mfu(t_rag_store), 4),
        "isolated_retrieval_ms": round(t_retr * 1e3, 2),
        "isolated_write_ms": round(t_write * 1e3, 2),
        "retrieval_gap_ms": round((t_rag - t_off) * 1e3, 2),
        "store_gap_ms": round((t_rag_store - t_rag) * 1e3, 2),
        "retrieval_hbm_gb_per_step": round(retr_bytes / 1e9, 3),
        "tok_s_rag_live_store10": round(
            tokens_per_step / (t_rag + 0.1 * (t_rag_store - t_rag)), 1),
    }))


if __name__ == "__main__":
    main()
