"""HTTP serving endpoint test: in-process aiohttp app over the batched
generator (the CLI `serve` command's core), per-request params honored."""

import asyncio
import dataclasses

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")


def test_http_generate_roundtrip():
    import jax
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestClient, TestServer

    from aura_snn_rag_tpu.config import get_debug_config
    from aura_snn_rag_tpu.generation.serving import BatchedGenerator
    from aura_snn_rag_tpu.models import HippocampalTransformer

    cfg = dataclasses.replace(get_debug_config().model, dropout=0.0)
    model = HippocampalTransformer(cfg, deterministic=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    gen = BatchedGenerator(model, params, batch_size=2, prompt_pad=8,
                           max_new_tokens=4)

    async def handle_generate(request):
        body = await request.json()
        toks = await gen.submit(
            np.asarray(body["prompt_ids"], np.int32),
            max_new_tokens=int(body.get("max_new_tokens", 4)),
            temperature=float(body.get("temperature", 0.8)),
            top_p=float(body.get("top_p", 0.9)))
        return web.json_response({"tokens": [int(t) for t in toks]})

    async def handle_stats(request):
        return web.json_response(gen.stats)

    async def run():
        app = web.Application()
        app.router.add_post("/generate", handle_generate)
        app.router.add_get("/stats", handle_stats)
        server_task = asyncio.create_task(gen.serve_forever(flush_ms=10))
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/generate", json={
                "prompt_ids": [1, 2, 3], "max_new_tokens": 2,
                "temperature": 0.5})
            assert r.status == 200
            data = await r.json()
            assert len(data["tokens"]) == 2
            r2 = await client.get("/stats")
            stats = await r2.json()
            assert stats["requests"] == 1
        server_task.cancel()

    asyncio.run(run())
