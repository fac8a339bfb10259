"""Phoneme → formant-frequency spike-pattern encoder.

Parity with `FrequencyPatternEncoder`
(/root/reference/src/maths/frequency_encoder.py:44-212): an IPA phoneme →
(F1, F2) formant table, precomputed sinusoid-threshold spike patterns per
phoneme, learnable amplitude/frequency adaptation, and F1/F2 combination
weights. The formant values are standard acoustic-phonetics reference
numbers (Peterson–Barney style), re-tabulated here.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# IPA phoneme → (F1, F2) dominant frequencies in Hz
IPA_FORMANTS: Dict[str, Tuple[float, float]] = {
    # vowels
    "i": (270, 2290), "ɪ": (390, 1990), "e": (530, 1840),
    "ɛ": (660, 1720), "æ": (860, 1720), "ɑ": (730, 1090),
    "ɔ": (570, 840), "o": (450, 880), "ʊ": (440, 1020),
    "u": (300, 870), "ə": (500, 1500),
    # consonants (dominant ranges)
    "p": (100, 500), "b": (100, 500), "t": (4000, 8000),
    "d": (4000, 8000), "k": (2000, 4000), "g": (2000, 4000),
    "f": (6000, 12000), "s": (8000, 12000), "ʃ": (3000, 6000),
    "h": (500, 2000), "l": (200, 400), "r": (300, 600),
    "m": (200, 300), "n": (200, 300),
}


class FrequencyEncoderParams(NamedTuple):
    amplitude_scale: jax.Array   # [n_phonemes]
    frequency_shift: jax.Array   # [n_phonemes]
    f1_weight: jax.Array         # scalar
    f2_weight: jax.Array         # scalar


class FrequencyPatternEncoder:
    """Precomputed formant spike patterns + learnable adaptation."""

    def __init__(self, d_model: int = 256, sample_rate: int = 1000,
                 duration_ms: int = 100):
        self.d_model = d_model
        self.sample_rate = sample_rate
        self.samples = int(duration_ms * sample_rate / 1000)
        self.phonemes = list(IPA_FORMANTS)
        self.index = {p: i for i, p in enumerate(self.phonemes)}
        # [n_phonemes, 2, samples] sinusoid basis for (F1, F2)
        t = np.arange(self.samples) / sample_rate
        basis = np.zeros((len(self.phonemes), 2, self.samples), np.float32)
        for i, p in enumerate(self.phonemes):
            f1, f2 = IPA_FORMANTS[p]
            # alias high formants into the sample band (the reference's
            # low-rate sampling does the same implicitly)
            basis[i, 0] = np.sin(2 * math.pi * (f1 % (sample_rate / 2)) * t)
            basis[i, 1] = np.sin(2 * math.pi * (f2 % (sample_rate / 2)) * t)
        self.basis = jnp.asarray(basis)

    def init_params(self) -> FrequencyEncoderParams:
        n = len(self.phonemes)
        return FrequencyEncoderParams(
            amplitude_scale=jnp.ones((n,)),
            frequency_shift=jnp.zeros((n,)),
            f1_weight=jnp.asarray(1.0),
            f2_weight=jnp.asarray(0.5),
        )

    def phoneme_pattern(self, params: FrequencyEncoderParams,
                        phoneme: str,
                        threshold: float = 0.5) -> jax.Array:
        """Spike pattern [samples] for one phoneme."""
        i = self.index.get(phoneme, self.index["ə"])
        wave = (params.f1_weight * self.basis[i, 0]
                + params.f2_weight * self.basis[i, 1])
        wave = wave * params.amplitude_scale[i] + params.frequency_shift[i]
        return (wave > threshold).astype(jnp.float32)

    def encode(self, params: FrequencyEncoderParams,
               phonemes: List[str]) -> jax.Array:
        """Phoneme sequence → [len, d_model] spike features (pattern folded
        into d_model bins by averaging)."""
        rows = []
        fold = max(1, self.samples // self.d_model)
        for p in phonemes:
            pat = self.phoneme_pattern(params, p)
            usable = (self.samples // fold) * fold
            folded = pat[:usable].reshape(-1, fold).mean(axis=1)
            if folded.shape[0] < self.d_model:
                folded = jnp.pad(folded,
                                 (0, self.d_model - folded.shape[0]))
            rows.append(folded[:self.d_model])
        if not rows:
            return jnp.zeros((0, self.d_model))
        return jnp.stack(rows)
