"""Generation serving: batched request loop over the KV-cached decoder.

No reference equivalent (the reference has no serving story, SURVEY §3.3);
this provides the production path: requests accumulate into fixed-size
batches (padded to static shapes so nothing recompiles), decode runs the
jitted KV-cached sampler, and episodic memory conditions every request when
a bank is attached.
"""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class GenerationRequest:
    prompt_ids: np.ndarray
    max_new_tokens: int = 64
    temperature: float = 0.8
    top_p: float = 0.9
    future: Optional[asyncio.Future] = None
    submitted_at: float = field(default_factory=time.time)


class BatchedGenerator:
    """Static-shape batched generation server.

    Pads prompts to `prompt_pad` and batches to `batch_size` (static shapes
    → one compile per (pad, new_tokens) bucket). `serve_forever` drains an
    asyncio queue with a max-latency flush.
    """

    def __init__(self, model, params, batch_size: int = 8,
                 prompt_pad: int = 64, max_new_tokens: int = 64,
                 memory_state=None, pad_token_id: int = 0,
                 rng: Optional[jax.Array] = None, mesh=None,
                 weights_dtype: Optional[str] = None):
        """mesh: optional ('data','model') Mesh — params are placed
        tensor-parallel per parallel/mesh.py rules and decode runs sharded
        (TP collectives over ICI); batches replicate over 'data'.

        weights_dtype: optional "bfloat16" — cast f32 weights once at
        server start. Small-batch decode is weight-READ-bound (every
        parameter crosses HBM once per token), so bf16 weights halve the
        per-token bandwidth; sampled outputs may differ in near-ties
        (greedy argmax on well-separated logits is unaffected). Default
        keeps the training dtype."""
        self.model = model
        if weights_dtype == "bfloat16":
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        if mesh is not None:
            from aura_snn_rag_tpu.parallel.mesh import shard_params
            params = shard_params(params, mesh)
            if memory_state is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                repl = NamedSharding(mesh, P())
                memory_state = jax.tree.map(
                    lambda x: jax.device_put(x, repl), memory_state)
        self.mesh = mesh
        self.params = params
        self.batch_size = batch_size
        self.prompt_pad = prompt_pad
        self.max_new_tokens = max_new_tokens
        self.memory_state = memory_state
        self.pad_token_id = pad_token_id
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.queue: asyncio.Queue = asyncio.Queue()
        self.stats = {"requests": 0, "batches": 0, "tokens": 0,
                      "mean_batch_fill": 0.0}
        self._jit_generate = {}      # max_new_tokens bucket → compiled fn

    # ------------------------------------------------------------------
    def _pad_batch(self, requests: List[GenerationRequest]) -> np.ndarray:
        batch = np.full((self.batch_size, self.prompt_pad),
                        self.pad_token_id, np.int32)
        for i, r in enumerate(requests):
            ids = np.asarray(r.prompt_ids, np.int32)[-self.prompt_pad:]
            batch[i, -len(ids):] = ids      # left-pad: prompt ends at edge
        return batch

    def _bucket(self, n: int) -> int:
        """Round a requested token count up to a power-of-2 compile bucket,
        capped at the server's max_new_tokens (static decode-scan length —
        a handful of buckets instead of one compile per value)."""
        n = max(1, min(n, self.max_new_tokens))
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_new_tokens)

    def generate_batch(self, requests: List[GenerationRequest]
                       ) -> List[np.ndarray]:
        """Synchronous batched decode; returns per-request new tokens.

        Per-request temperature/top_p ride as traced [B] arrays (no
        recompile per value); max_new_tokens selects a power-of-2 compile
        bucket and each request's output is trimmed to its own limit.
        """
        from aura_snn_rag_tpu.generation import generate

        assert len(requests) <= self.batch_size
        batch = self._pad_batch(requests)
        temps = np.ones((self.batch_size,), np.float32)
        top_ps = np.ones((self.batch_size,), np.float32)
        for i, r in enumerate(requests):
            temps[i] = r.temperature
            top_ps[i] = r.top_p
        bucket = self._bucket(max(r.max_new_tokens for r in requests))
        self.rng, sub = jax.random.split(self.rng)
        if bucket not in self._jit_generate:
            use_memory = self.memory_state is not None
            self._jit_generate[bucket] = jax.jit(
                lambda p, ids, r, mem, t, tp: generate(
                    self.model, p, ids, bucket, r,
                    temperature=t, top_p=tp,
                    memory_state=mem, use_memory=use_memory))
        out = self._jit_generate[bucket](
            self.params, jnp.asarray(batch), sub, self.memory_state,
            jnp.asarray(temps), jnp.asarray(top_ps))
        new_tokens = np.asarray(out[:, self.prompt_pad:])
        self.stats["requests"] += len(requests)
        self.stats["batches"] += 1
        self.stats["tokens"] += sum(
            min(r.max_new_tokens, bucket) for r in requests)
        fill = len(requests) / self.batch_size
        n = self.stats["batches"]
        self.stats["mean_batch_fill"] += (fill - self.stats["mean_batch_fill"]) / n
        return [new_tokens[i][:requests[i].max_new_tokens]
                for i in range(len(requests))]

    # ------------------------------------------------------------------
    async def submit(self, prompt_ids, max_new_tokens: int = 64,
                     temperature: float = 0.8, top_p: float = 0.9
                     ) -> np.ndarray:
        loop = asyncio.get_running_loop()
        req = GenerationRequest(np.asarray(prompt_ids),
                                max_new_tokens, temperature, top_p,
                                future=loop.create_future())
        await self.queue.put(req)
        return await req.future

    async def serve_forever(self, flush_ms: float = 20.0) -> None:
        """Drain the queue: flush on a full batch or after flush_ms."""
        while True:
            batch: List[GenerationRequest] = [await self.queue.get()]
            deadline = time.monotonic() + flush_ms / 1000.0
            while len(batch) < self.batch_size:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(
                        self.queue.get(), timeout))
                except asyncio.TimeoutError:
                    break
            results = await asyncio.to_thread(self.generate_batch, batch)
            for req, toks in zip(batch, results):
                if req.future is not None and not req.future.done():
                    req.future.set_result(toks)
