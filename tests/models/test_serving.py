"""Batched generation serving tests."""

import asyncio
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.generation.serving import BatchedGenerator
from aura_snn_rag_tpu.models import HippocampalTransformer


def make_generator(batch_size=4):
    cfg = dataclasses.replace(get_debug_config().model, dropout=0.0)
    model = HippocampalTransformer(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    return BatchedGenerator(model, params, batch_size=batch_size,
                            prompt_pad=8, max_new_tokens=4)


class TestServing:
    def test_sync_batch(self):
        gen = make_generator()
        reqs = []
        from aura_snn_rag_tpu.generation.serving import GenerationRequest
        for i in range(3):
            reqs.append(GenerationRequest(np.asarray([1 + i, 2, 3])))
        outs = gen.generate_batch(reqs)
        assert len(outs) == 3
        for o in outs:
            assert o.shape == (4,)
            assert (o >= 0).all()
        assert gen.stats["requests"] == 3
        assert 0 < gen.stats["mean_batch_fill"] <= 1

    def test_async_serve_loop(self):
        gen = make_generator(batch_size=2)

        async def run():
            server = asyncio.create_task(gen.serve_forever(flush_ms=50))
            a, b, c = await asyncio.gather(
                gen.submit([1, 2, 3]),
                gen.submit([4, 5]),
                gen.submit([6]),
            )
            server.cancel()
            return a, b, c

        a, b, c = asyncio.run(run())
        for out in (a, b, c):
            assert out.shape == (4,)
        assert gen.stats["batches"] >= 2  # batch_size 2 → at least 2 flushes
