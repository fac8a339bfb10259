"""Command-line interface.

Replaces the reference's stub (`/root/reference/src/cli/main.py:4-14`,
unwired click command) with a working CLI over this framework: train /
generate / ingest / bench / brain-demo.
"""

from __future__ import annotations

import json
import os
import sys

import click


@click.group()
def main():
    """aura-snn-rag-tpu: TPU-native hippocampal SNN-RAG framework."""


@main.command()
@click.option("--preset", default="test",
              type=click.Choice(["debug", "test", "small", "medium", "full"]))
@click.option("--steps", default=None, type=int,
              help="override max training steps")
@click.option("--data", default=None, type=click.Path(exists=True),
              help="pre-tokenized .npy [n_seq, seq_len] token file")
@click.option("--checkpoint-dir", default="checkpoints")
@click.option("--seed", default=42, type=int)
def train(preset, steps, data, checkpoint_dir, seed):
    """Train the hippocampal transformer."""
    import dataclasses

    import numpy as np

    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
    from aura_snn_rag_tpu.training.data import (
        batch_iterator, load_or_synthesize)
    from aura_snn_rag_tpu.training.trainer import Trainer

    cfg = getattr(cfg_mod, f"get_{preset}_config")()
    if steps:
        cfg = cfg.replace(training=dataclasses.replace(
            cfg.training, max_steps=steps))
    trainer = Trainer(cfg, seed=seed)
    ckpt = CheckpointManager(checkpoint_dir)
    start = ckpt.restore(trainer)
    if start:
        click.echo(f"resumed from step {start}")

    sequences = load_or_synthesize(data, cfg.model, seed)
    tcfg = cfg.training
    it = batch_iterator(sequences, tcfg.batch_size, seed)
    for step in range(start, tcfg.max_steps):
        ids = next(it)
        metrics = trainer.train_step(ids, ids)
        if step % tcfg.logging_steps == 0:
            import math
            ppl = math.exp(min(metrics["ce"], 20))
            click.echo(f"step {step}: loss={metrics['loss']:.4f} "
                       f"ppl={ppl:.1f} mem={metrics['use_memory']}")
        if step > 0 and step % tcfg.save_steps == 0:
            ckpt.save(step, trainer, metrics["loss"])
    ckpt.save(tcfg.max_steps, trainer, metrics["loss"])
    click.echo("done")


@main.command()
@click.option("--checkpoint-dir", default="checkpoints")
@click.option("--preset", default="test")
@click.option("--prompt-ids", default="1,2,3",
              help="comma-separated token ids")
@click.option("--max-new-tokens", default=32, type=int)
@click.option("--temperature", default=0.8, type=float)
@click.option("--top-k", default=50, type=int)
@click.option("--top-p", default=0.9, type=float)
def generate(checkpoint_dir, preset, prompt_ids, max_new_tokens,
             temperature, top_k, top_p):
    """Generate tokens from a checkpoint (KV-cached decode)."""
    import jax
    import jax.numpy as jnp

    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.generation import generate as gen
    from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
    from aura_snn_rag_tpu.training.trainer import Trainer

    cfg = getattr(cfg_mod, f"get_{preset}_config")()
    trainer = Trainer(cfg)
    CheckpointManager(checkpoint_dir).restore(trainer)
    ids = jnp.asarray([[int(x) for x in prompt_ids.split(",")]],
                      jnp.int32)
    out = gen(trainer.eval_model, trainer.state.params, ids,
              max_new_tokens, jax.random.PRNGKey(0),
              temperature=temperature, top_k=top_k, top_p=top_p)
    click.echo(json.dumps(out[0].tolist()))


@main.command()
@click.argument("path", type=click.Path(exists=True))
@click.option("--format", "fmt", default="jsonl",
              type=click.Choice(["jsonl", "csv"]))
@click.option("--max-items", default=None, type=int)
@click.option("--feature-dim", default=768, type=int)
def ingest(path, fmt, max_items, feature_dim):
    """Ingest a JSONL/CSV corpus into an episodic memory bank."""
    from aura_snn_rag_tpu.config import MemoryConfig
    from aura_snn_rag_tpu.encoders import FastHashEmbedder
    from aura_snn_rag_tpu.memory.hippocampus import HippocampalFormation
    from aura_snn_rag_tpu.services.ingest import (
        ingest_csv_pairs_to_memory, ingest_jsonl_to_memory)

    hf = HippocampalFormation(MemoryConfig(feature_dim=feature_dim))
    embed = FastHashEmbedder(dim=feature_dim)
    fn = ingest_jsonl_to_memory if fmt == "jsonl" else \
        ingest_csv_pairs_to_memory
    n = fn(hf, path, lambda ts: embed.embed_batch(ts), max_items=max_items)
    click.echo(f"stored {n} memories (bank count {hf.memory_count})")


@main.command()
@click.option("--small", is_flag=True)
def bench(small):
    """Run the retrieval benchmark."""
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(root, "bench.py")]
    if small:
        cmd.append("--small")
    subprocess.run(cmd, check=True)


@main.command("brain-demo")
@click.argument("text", default="remember to analyze this pattern")
def brain_demo(text):
    """Route a text through the neuromorphic brain system."""
    from aura_snn_rag_tpu.services.brain_system import NeuromorphicBrainSystem
    system = NeuromorphicBrainSystem(d_model=32, n_neurons=32)
    out, info = system.process_text(text)
    click.echo(f"plan: {[(z, round(float(w), 3)) for z, w in info['plan']]}")
    click.echo(f"output norm: {float(abs(out).mean()):.4f}")
    click.echo(json.dumps(system.get_health()["recommendations"]))


if __name__ == "__main__":
    main()


@main.command()
@click.option("--out", default="/root/data/corpus")
@click.option("--vocab", default=32_000, type=int)
def corpus(out, vocab):
    """Build the offline training corpus (on-disk code+prose → BPE →
    uint16 token streams). See tools/build_offline_corpus.py."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable,
                    os.path.join(repo, "tools", "build_offline_corpus.py"),
                    "--out", out, "--vocab", str(vocab)], check=True)


@main.command()
@click.option("--epochs", default=5, type=int)
@click.option("--hidden", default=1024, type=int)
def mnist(epochs, hidden):
    """Run the hybrid Whitener→Oja→readout benchmark (reference gate:
    94.34% — README-github.md:228)."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable,
                    os.path.join(repo, "benchmarks", "bench_mnist.py"),
                    "--epochs", str(epochs), "--hidden", str(hidden)],
                   check=True)


@main.command()
@click.option("--host", default="127.0.0.1")
@click.option("--port", default=8787, type=int)
@click.option("--preset", default="test")
@click.option("--checkpoint-dir", default=None, type=click.Path())
@click.option("--batch-size", default=8, type=int)
@click.option("--max-new-tokens", default=64, type=int)
@click.option("--bf16-weights", is_flag=True,
              help="cast f32 weights to bf16 once at start (halves the "
                   "weight-read bandwidth of small-batch decode)")
def serve(host, port, preset, checkpoint_dir, batch_size, max_new_tokens,
          bf16_weights):
    """HTTP generation server over the batched KV-cached decoder.

    POST /generate {"prompt_ids": [...], "max_new_tokens": N,
    "temperature": T, "top_p": P} → {"tokens": [...]}; GET /stats.
    No reference equivalent (the reference has no serving story).
    """
    import asyncio
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.generation.serving import BatchedGenerator
    from aura_snn_rag_tpu.models import HippocampalTransformer

    cfg = getattr(cfg_mod, f"get_{preset}_config")()
    model_cfg = dataclasses.replace(cfg.model, dropout=0.0)
    model = HippocampalTransformer(model_cfg, deterministic=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    if checkpoint_dir:
        from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
        from aura_snn_rag_tpu.training.trainer import Trainer
        tr = Trainer(cfg, seed=0)
        CheckpointManager(checkpoint_dir).restore(tr)
        params = tr.state.params
    gen = BatchedGenerator(
        model, params, batch_size=batch_size, prompt_pad=64,
        max_new_tokens=max_new_tokens,
        weights_dtype="bfloat16" if bf16_weights else None)

    async def run_server():
        from aiohttp import web

        async def handle_generate(request):
            body = await request.json()
            toks = await gen.submit(
                np.asarray(body["prompt_ids"], np.int32),
                max_new_tokens=int(body.get("max_new_tokens",
                                            max_new_tokens)),
                temperature=float(body.get("temperature", 0.8)),
                top_p=float(body.get("top_p", 0.9)))
            return web.json_response({"tokens": [int(t) for t in toks]})

        async def handle_stats(request):
            return web.json_response(gen.stats)

        app = web.Application()
        app.router.add_post("/generate", handle_generate)
        app.router.add_get("/stats", handle_stats)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        click.echo(f"serving on http://{host}:{port}")
        server = asyncio.create_task(gen.serve_forever())
        await server

    asyncio.run(run_server())
