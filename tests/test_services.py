"""Ingestion + continuous learning tests — mirrors
test_ingestion_and_gating.py:30-79 (JSONL/CSV ingest stores exactly N
memories with flexible field mapping) without any model forward."""

import asyncio
import json
import os

import numpy as np
import pytest

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.encoders import EmbeddingCache, FastHashEmbedder
from aura_snn_rag_tpu.memory.hippocampus import HippocampalFormation
from aura_snn_rag_tpu.services.continuous_learning import (
    ContinuousLearningOrchestrator, FeedConfig)
from aura_snn_rag_tpu.services.ingest import (
    ingest_csv_pairs_to_memory, ingest_jsonl_to_memory)


def make_hippo():
    return HippocampalFormation(MemoryConfig(
        max_memories=256, feature_dim=64, k_centroids=8,
        rebuild_interval=10_000, n_place_cells=16, n_grid_cells=8,
        n_time_cells=4), seed=0)


def hash_embed_fn(dim):
    emb = FastHashEmbedder(dim=dim)
    return lambda texts: emb.embed_batch(texts)


class TestIngest:
    def test_jsonl_flexible_fields(self, tmp_path):
        p = tmp_path / "data.jsonl"
        rows = [
            {"text": "alpha beta gamma"},
            {"content": "delta epsilon"},
            {"prompt": "what is x", "response": "x is y"},
            {"irrelevant": "nope"},
            {"question": "q1", "answer": "a1"},
        ]
        p.write_text("\n".join(json.dumps(r) for r in rows))
        hf = make_hippo()
        n = ingest_jsonl_to_memory(hf, str(p), hash_embed_fn(64))
        assert n == 4            # the irrelevant row is skipped
        assert hf.memory_count == 4

    def test_csv_pairs(self, tmp_path):
        p = tmp_path / "pairs.csv"
        p.write_text("prompt,response\nhello,world\nfoo,bar\n")
        hf = make_hippo()
        n = ingest_csv_pairs_to_memory(hf, str(p), hash_embed_fn(64))
        assert n == 2
        assert hf.memory_count == 2

    def test_max_items(self, tmp_path):
        p = tmp_path / "data.jsonl"
        p.write_text("\n".join(json.dumps({"text": f"t{i}"})
                               for i in range(50)))
        hf = make_hippo()
        n = ingest_jsonl_to_memory(hf, str(p), hash_embed_fn(64),
                                   max_items=10, batch_size=4)
        assert n <= 14 and n >= 10  # flushes on batch granularity


class TestOrchestrator:
    def test_process_batch_stores_memories(self):
        hf = make_hippo()
        orch = ContinuousLearningOrchestrator(hf, vocab_size=1000)
        from aura_snn_rag_tpu.services.continuous_learning import IngestItem
        orch.process_batch([IngestItem("the quick brown fox"),
                            IngestItem("jumps over the lazy dog")])
        assert hf.memory_count == 2
        assert orch.stats["memories_stored"] == 2
        # STDP weights moved for the hashed tokens
        assert float(np.asarray(orch.stdp_state.token_weights).max()) > 0.5

    def test_dedup(self):
        hf = make_hippo()
        orch = ContinuousLearningOrchestrator(hf)

        async def run():
            a = await orch.submit("same text")
            b = await orch.submit("same text")
            return a, b
        a, b = asyncio.run(run())
        assert a and not b
        assert orch.stats["duplicates_skipped"] == 1

    def test_one_shot_memorize_and_retrieve(self):
        hf = make_hippo()
        orch = ContinuousLearningOrchestrator(hf)
        mid = orch.one_shot_memorize_text("the capital of france is paris")
        q = orch.hash_embedder.embed("capital of france")
        results = hf.retrieve_similar_memories(q, k=1)
        assert results[0][0] == mid

    def test_vocab_dir_watcher(self, tmp_path):
        hf = make_hippo()
        d = tmp_path / "vocab"
        d.mkdir()
        (d / "a.txt").write_text("hello vocab world")
        orch = ContinuousLearningOrchestrator(hf, vocab_dir=str(d),
                                              batch_size=4)

        async def run():
            await orch.start()
            await asyncio.sleep(1.5)
            await orch.stop()
        asyncio.run(run())
        assert hf.memory_count == 1

    def test_config_roundtrip(self, tmp_path):
        hf = make_hippo()
        orch = ContinuousLearningOrchestrator(
            hf, feeds=[FeedConfig("http://x/rss", "tech")],
            vocab_dir="/tmp/v", batch_size=8)
        p = tmp_path / "cl.json"
        orch.save_config(str(p))
        orch2 = ContinuousLearningOrchestrator.load_config(str(p), hf)
        assert orch2.feeds[0].url == "http://x/rss"
        assert orch2.batch_size == 8


class TestFeedParsing:
    RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
      <item><title>First story</title><description>Body &lt;b&gt;one&lt;/b&gt;</description></item>
      <item><title>Second</title><description>two</description></item>
    </channel></rss>"""
    ATOM = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
      <entry><title>Atom title</title><summary>atom body</summary></entry>
    </feed>"""

    def test_rss_entries(self):
        from aura_snn_rag_tpu.services.continuous_learning import (
            parse_feed_entries)
        entries = parse_feed_entries(self.RSS)
        assert len(entries) == 2
        assert "First story" in entries[0]
        assert "one" in entries[0]  # html stripped

    def test_atom_entries(self):
        from aura_snn_rag_tpu.services.continuous_learning import (
            parse_feed_entries)
        entries = parse_feed_entries(self.ATOM)
        assert entries == ["Atom title atom body"]

    def test_garbage_returns_empty(self):
        from aura_snn_rag_tpu.services.continuous_learning import (
            parse_feed_entries)
        assert parse_feed_entries("not xml at all") == []


class TestEncoders:
    def test_hash_embedder_deterministic_and_normalized(self):
        emb = FastHashEmbedder(dim=128)
        a = emb.embed("hello world")
        b = emb.embed("hello world")
        np.testing.assert_array_equal(a, b)
        assert abs(np.linalg.norm(a) - 1.0) < 1e-5
        c = emb.embed("completely different text")
        assert not np.allclose(a, c)

    def test_similar_text_closer_than_different(self):
        emb = FastHashEmbedder(dim=256)
        a = emb.embed("the cat sat on the mat")
        b = emb.embed("the cat sat on the hat")
        c = emb.embed("quantum chromodynamics lattice")
        assert np.dot(a, b) > np.dot(a, c)

    def test_token_indices(self):
        emb = FastHashEmbedder(dim=64, token_vocab=100)
        ids = emb.token_indices("a b c a")
        assert ids.shape == (4,)
        assert ids[0] == ids[3]
        assert (ids < 100).all()

    def test_embedding_cache(self, tmp_path):
        cache = EmbeddingCache(str(tmp_path))
        assert cache.get("x") is None
        cache.put("x", np.ones(4), np.arange(3))
        e, t = cache.get("x")
        np.testing.assert_array_equal(e, np.ones(4))
        np.testing.assert_array_equal(t, np.arange(3))
