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


class TestPerRequestParams:
    """Per-request sampling params must be honored (ADVICE r1 medium: the
    old closure baked requests[0].temperature and self.max_new_tokens into
    the first compile)."""

    def test_per_request_max_new_tokens_trimmed(self):
        from aura_snn_rag_tpu.generation.serving import GenerationRequest
        gen = make_generator()
        reqs = [GenerationRequest(np.asarray([1, 2, 3]), max_new_tokens=2),
                GenerationRequest(np.asarray([4, 5]), max_new_tokens=4)]
        outs = gen.generate_batch(reqs)
        assert outs[0].shape == (2,)
        assert outs[1].shape == (4,)

    def test_temperature_is_traced_not_baked(self):
        """Two batches with different temperatures must not recompile, and
        near-zero temperature must behave greedily (≈argmax) while a huge
        temperature stays random — proving the value is live."""
        from aura_snn_rag_tpu.generation.serving import GenerationRequest
        gen = make_generator(batch_size=2)
        r_cold = [GenerationRequest(np.asarray([1, 2, 3]),
                                    temperature=1e-4, top_p=1.0)]
        outs1 = gen.generate_batch(r_cold)
        outs2 = gen.generate_batch([GenerationRequest(
            np.asarray([1, 2, 3]), temperature=1e-4, top_p=1.0)])
        # greedy at T→0: identical outputs across calls (same prompt)
        np.testing.assert_array_equal(outs1[0], outs2[0])
        # only one compile bucket was created despite differing temps later
        n_compiled = len(gen._jit_generate)
        gen.generate_batch([GenerationRequest(
            np.asarray([1, 2, 3]), temperature=5.0, top_p=1.0)])
        assert len(gen._jit_generate) == n_compiled

    def test_hot_temperature_differs_from_cold(self):
        from aura_snn_rag_tpu.generation.serving import GenerationRequest
        gen = make_generator(batch_size=2)
        cold = gen.generate_batch([GenerationRequest(
            np.asarray([1, 2, 3]), temperature=1e-4, top_p=1.0)])[0]
        hots = [gen.generate_batch([GenerationRequest(
            np.asarray([1, 2, 3]), temperature=50.0, top_p=1.0)])[0]
            for _ in range(4)]
        # at T=50 the distribution is ~uniform over 512 tokens: the odds all
        # 4 samples equal the greedy output are negligible
        assert any(not np.array_equal(cold, h) for h in hots)


class TestShardedServing:
    """Tensor-parallel decode: generator params sharded over the 'model'
    axis via the TP rules; outputs identical to single-device decode
    (same rng, greedy)."""

    def test_tp_decode_matches_single_device(self):
        from jax.sharding import Mesh
        from aura_snn_rag_tpu.generation.serving import GenerationRequest

        gen_ref = make_generator(batch_size=2)
        req = lambda: [GenerationRequest(np.asarray([1, 2, 3]),
                                         temperature=1e-4, top_p=1.0,
                                         max_new_tokens=4)]
        out_ref = gen_ref.generate_batch(req())[0]

        cfg = dataclasses.replace(get_debug_config().model, dropout=0.0)
        model = HippocampalTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32))
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                    ("data", "model"))
        gen_tp = BatchedGenerator(model, params, batch_size=2,
                                  prompt_pad=8, max_new_tokens=4, mesh=mesh)
        out_tp = gen_tp.generate_batch(req())[0]
        # greedy at T→0: sharded and unsharded decode agree
        np.testing.assert_array_equal(out_ref, out_tp)


class TestBf16Serving:
    def test_bf16_weights_cast_and_serve(self):
        """weights_dtype='bfloat16' casts f32 params once and the decode
        loop still produces valid tokens (weight-read-bound small-batch
        decode halves its HBM traffic)."""
        cfg = dataclasses.replace(get_debug_config().model, dropout=0.0)
        model = HippocampalTransformer(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        gen = BatchedGenerator(model, params, batch_size=2, prompt_pad=8,
                               max_new_tokens=4, weights_dtype="bfloat16")
        f32_left = [x for x in jax.tree.leaves(gen.params)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32]
        assert not f32_left
        from aura_snn_rag_tpu.generation.serving import GenerationRequest
        outs = gen.generate_batch([GenerationRequest(np.asarray([1, 2, 3]))])
        assert outs[0].shape == (4,) and (outs[0] >= 0).all()
