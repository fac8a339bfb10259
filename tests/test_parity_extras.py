"""Tests for parity-surface extras: SNNRAG front, dict STDP, neuron factory,
one-shot helpers, multimodal processors, pretrain pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.memory.hippocampus import HippocampalFormation
from aura_snn_rag_tpu.models.snn_rag import SNNRAGTransformer, snn_rag_config
from aura_snn_rag_tpu.services.one_shot import (
    one_shot_memorize_and_generate, one_shot_memorize_text,
    retrieve_custom_memories, store_custom_memory)
from aura_snn_rag_tpu.training.stdp_dict import STDPLearnerDict
from aura_snn_rag_tpu.zones.multimodal import (
    EventDrivenProcessor, MultiModalProcessor)
from aura_snn_rag_tpu.zones.neuron_factory import (
    MaturationStage, Neuron, NeuronFactory)
from aura_snn_rag_tpu.zones.processor import NeuromorphicProcessor


class TestSNNRAG:
    def test_create_and_generate(self):
        cfg = get_debug_config()
        mcfg = cfg.memory
        model = SNNRAGTransformer.create(
            dataclasses.replace(cfg.model, dropout=0.0, num_layers=2),
            mcfg)
        assert model.config.use_rag
        assert 0 in model.config.snn_layers
        hf = HippocampalFormation(mcfg, seed=0)
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, use_memory=True,
                            memory_state=hf.state)
        out = model.generate(params, ids, 4, memory_state=hf.state)
        assert out.shape == (1, 7)


class TestOneShot:
    def test_memorize_and_generate_conditioning(self):
        cfg = get_debug_config()
        model_cfg = dataclasses.replace(cfg.model, dropout=0.0)
        from aura_snn_rag_tpu.models import HippocampalTransformer
        model = HippocampalTransformer(model_cfg,
                                       memory_config=cfg.memory)
        hf = HippocampalFormation(cfg.memory, seed=0)
        ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, use_memory=True,
                            memory_state=hf.state)
        mid = one_shot_memorize_text(model, params, hf, ids)
        assert hf.memory_count == 1
        # retrieval round trip through the custom-memory helpers
        q = np.asarray(hf.state.features[0])
        results = retrieve_custom_memories(hf, q, k=1)
        assert results[0][0] == mid
        mid2, out = one_shot_memorize_and_generate(
            model, params, hf, jnp.asarray([[9, 10]], jnp.int32),
            ids, max_new_tokens=3)
        assert hf.memory_count == 2
        assert out.shape == (1, 7)

    def test_store_custom_memory(self):
        cfg = get_debug_config()
        hf = HippocampalFormation(cfg.memory, seed=0)
        store_custom_memory(hf, "fact-1", np.ones(64, np.float32))
        assert hf.memory_count == 1
        assert retrieve_custom_memories(
            hf, np.ones(64, np.float32), 1)[0][0] == "fact-1"


class TestSTDPDict:
    def test_ltp_and_pruning(self):
        learner = STDPLearnerDict(lr_plus=0.05)
        stats = learner.process_sequence([3, 3, 3, 7])
        assert stats["n_tracked"] >= 2
        mods = learner.get_modulations([3, 99])
        assert mods[0] > mods[1] == 1.0

    def test_decay_prunes(self):
        learner = STDPLearnerDict(lr_plus=0.001, decay=0.1,
                                  prune_below=0.4)
        learner.process_sequence([1, 2])
        for _ in range(5):
            learner.process_sequence([])
        assert learner.weights == {}


class TestNeuronFactory:
    def test_population_and_stimulation(self):
        factory = NeuronFactory()
        pop = factory.create_population(5, "lif", n_inputs=4)
        assert factory.stats()["total"] == 5
        n = pop[0]
        fired = n.stimulate(np.ones(4, np.float32) * 10)
        assert isinstance(fired, bool)
        if fired:
            assert n.state.fatigue > 0

    def test_maturation(self):
        n = Neuron("n0", "lif", 4) if False else \
            NeuronFactory().create("lif", 4)
        assert n.state.maturation == MaturationStage.IMMATURE
        n.mature()
        assert n.state.maturation == MaturationStage.MATURE


class TestMultiModal:
    def _proc(self):
        proc = NeuromorphicProcessor(d_model=16)
        for z in ("prefrontal_cortex", "occipital_cortex",
                  "temporal_cortex", "hippocampus", "cerebellum",
                  "parietal_cortex"):
            proc.register_zone(z, lambda x: (x, {}))
        return proc

    def test_modalities_route(self):
        mm = MultiModalProcessor(self._proc())
        out_t, info_t = mm.process_text("remember the pattern")
        out_i, info_i = mm.process_image(np.random.rand(8, 8))
        out_a, info_a = mm.process_audio(np.sin(np.linspace(0, 50, 400)))
        for out in (out_t, out_i, out_a):
            assert jnp.all(jnp.isfinite(out))
        # image routes toward visual/pattern zones
        zones_i = [z for z, _ in info_i["plan"]]
        assert any(z in ("occipital_cortex", "parietal_cortex")
                   for z in zones_i)

    def test_event_driven_boost(self):
        proc = self._proc()
        ed = EventDrivenProcessor(proc)
        ed.process(jnp.ones((1, 16)), "analyze this")
        ed.process(jnp.ones((1, 16)), "analyze this")
        assert any(v > 1.0 for v in ed.zone_boost.values())


class TestPretrainPipeline:
    def test_corpus_embedding(self, tmp_path):
        from aura_snn_rag_tpu.encoders.pretrain_pipeline import (
            PretrainPipeline)
        d = tmp_path / "corpus"
        d.mkdir()
        (d / "a.txt").write_text("the first document")
        (d / "b.jsonl").write_text('{"text": "the second document"}\n')
        pipe = PretrainPipeline(dim=64, cache_dir=str(tmp_path / "cache"))
        out = pipe.run(str(d), out_path=str(tmp_path / "emb.npz"))
        assert out.shape == (2, 64)
        # cache hit on rerun
        out2 = pipe.run(str(d))
        np.testing.assert_allclose(out, out2)
        import os
        assert os.path.exists(tmp_path / "emb.npz")
