"""Dual-layer semantic+phonetic SRFFN (addition-only dual-stream encoder).

Parity with `DualLayerSRFFN`
(/root/reference/src/encoders/dual_layer_srffn.py:22-316): two addition-only
streams — semantic (event patterns) and phonetic (IPA formant spike
patterns) — with AdditiveReceptance gating, additive temporal mixing,
cross-modal fusion, and voice-characteristic extraction for speech-synthesis
parameters.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.encoders.event_encoder import FastEventPatternEncoder
from aura_snn_rag_tpu.encoders.frequency_encoder import (
    FrequencyEncoderParams, FrequencyPatternEncoder)
from aura_snn_rag_tpu.ops.maths import additive_receptance


class SRFFNParams(NamedTuple):
    semantic_patterns: jax.Array      # [d_ff, d_model]
    semantic_threshold: jax.Array     # [d_ff]
    phonetic_patterns: jax.Array      # [d_ff, d_model]
    phonetic_threshold: jax.Array     # [d_ff]
    fusion_weight: jax.Array          # scalar semantic↔phonetic balance
    freq_params: FrequencyEncoderParams


class DualLayerSRFFN:
    """Semantic + phonetic addition-only streams with cross-modal fusion."""

    def __init__(self, module_id: str = "srffn", d_model: int = 64,
                 d_ff: int = 128, seed: int = 0):
        self.module_id = module_id
        self.d_model = d_model
        self.d_ff = d_ff
        self.event_encoder = FastEventPatternEncoder(d_model, seed=seed)
        self.freq_encoder = FrequencyPatternEncoder(d_model)
        rng = np.random.RandomState(seed)
        self.params = SRFFNParams(
            semantic_patterns=jnp.asarray(
                rng.uniform(-0.1, 0.1, (d_ff, d_model)), jnp.float32),
            semantic_threshold=jnp.zeros((d_ff,)),
            phonetic_patterns=jnp.asarray(
                rng.uniform(-0.1, 0.1, (d_ff, d_model)), jnp.float32),
            phonetic_threshold=jnp.zeros((d_ff,)),
            fusion_weight=jnp.asarray(0.5),
            freq_params=self.freq_encoder.init_params(),
        )
        self._prev_state = jnp.zeros((d_ff,))

    # ------------------------------------------------------------------
    def temporal_mixing_additive(self, current: jax.Array,
                                 mix: float = 0.3) -> jax.Array:
        """Additive temporal mixing with the previous activation state."""
        mixed = (1 - mix) * current + mix * self._prev_state
        self._prev_state = mixed
        return mixed

    def cross_modal_fusion(self, semantic: jax.Array,
                           phonetic: jax.Array) -> jax.Array:
        w = jax.nn.sigmoid(self.params.fusion_weight)
        return w * semantic + (1 - w) * phonetic

    def extract_voice_characteristics(self, text: str,
                                      phonemes: Optional[List[str]] = None
                                      ) -> Dict[str, float]:
        """Voice-synthesis parameters from event/formant statistics."""
        analysis = self.event_encoder.get_event_analysis(text)
        emotion = analysis.get("emotion", 0.0)
        energy = analysis.get("motion", 0.0) + analysis.get("creation", 0.0)
        n_vowels = sum(1 for p in (phonemes or [])
                       if p in "iɪeɛæɑɔoʊuə")
        return {
            "pitch_base": 120.0 + 60.0 * emotion,
            "speech_rate": 1.0 + 0.5 * energy,
            "vowel_ratio": n_vowels / max(1, len(phonemes or [])),
            "intensity": min(1.0, 0.5 + emotion + 0.2 * energy),
        }

    # ------------------------------------------------------------------
    def forward(self, text: str,
                phonemes: Optional[List[str]] = None) -> Dict[str, Any]:
        """Dual-stream encode of text (+ optional phoneme sequence)."""
        semantic_in = jnp.asarray(self.event_encoder.encode(text))
        if phonemes:
            ph = self.freq_encoder.encode(self.params.freq_params, phonemes)
            phonetic_in = ph.mean(axis=0)
        else:
            phonetic_in = jnp.zeros((self.d_model,))

        semantic = additive_receptance(
            semantic_in[None, :], self.params.semantic_patterns,
            self.params.semantic_threshold)[0]
        phonetic = additive_receptance(
            phonetic_in[None, :], self.params.phonetic_patterns,
            self.params.phonetic_threshold)[0]

        fused = self.cross_modal_fusion(semantic, phonetic)
        mixed = self.temporal_mixing_additive(fused)
        return {
            "features": mixed,
            "semantic": semantic,
            "phonetic": phonetic,
            "voice": self.extract_voice_characteristics(text, phonemes),
        }

    def read_with_voice(self, text: str,
                        phonemes: Optional[List[str]] = None
                        ) -> Dict[str, Any]:
        out = self.forward(text, phonemes)
        return {"voice_params": out["voice"],
                "features": out["features"],
                "text": text}

    def get_network_topology(self) -> Dict[str, Any]:
        return {
            "module_id": self.module_id,
            "d_model": self.d_model,
            "d_ff": self.d_ff,
            "streams": ["semantic", "phonetic"],
            "n_phonemes": len(self.freq_encoder.phonemes),
            "n_events": len(self.event_encoder.event_names),
        }
