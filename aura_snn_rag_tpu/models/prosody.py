"""Prosody-driven spiking attention chain.

Parity map:
- `multi_channel_spiking_attention` ↔ `MultiChannelSpikingAttention`
  (/root/reference/src/core/language_zone/multi_channel_attention.py:6-52):
  three LIF chains over (amp, pitch, boundary) channels, weighted salience
  sum, optional smoothing, max-normalize, top-k winners → scalar gain
  `min + range·tanh(gain_up·avg_winner)`. The per-timestep LIF loop becomes
  a `lax.scan` (the reset makes it nonlinear — no associative scan).
- `prosody_channels_from_tokens` ↔ `prosody_channels_from_text`
  (multi_channel_attention.py:54-62): deterministic sin/cos hashes of ids.
- `prosody_attention_gains` ↔ `ProsodyAttentionBridge`
  (prosody_attention.py:10-37): gain = mu·(1 + salience).
- `CachedProsodyBridge` ↔ `OptimizedProsodyAttentionBridge`
  (optimized_prosody_attention.py:30-330): content-keyed LRU cache of
  channels + the 'analytical_balanced' preset + hit/miss stats.
- `prosody_gif_scan` ↔ `ProsodyModulatedGIF` (prosody_gif.py:8-108): GIF
  with attention-gain-modulated input gain, threshold
  (1 − 0.3·(g−1), clamp [0.5, 1.5]) and adaptation rate.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.ops.surrogate import multi_bit_spike
from aura_snn_rag_tpu.ops.neurons import GIFParams


class ProsodyAttentionConfig(NamedTuple):
    k_winners: int = 5
    decay: Tuple[float, float, float] = (0.7, 0.7, 0.7)
    weights: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    gain_up: float = 1.8
    min_gain: float = 0.5
    max_gain: float = 2.5
    smoothing: int = 0
    normalize_salience: bool = True


ANALYTICAL_BALANCED = ProsodyAttentionConfig(
    k_winners=7, decay=(0.75, 0.7, 0.65), weights=(1.0, 0.8, 1.2),
    gain_up=1.5, min_gain=0.6, max_gain=2.0, smoothing=3)

# high-sensitivity preset (ref tune_prosody_hyperparameters.py:173-182
# 'emotional_boosted': w=(1.2, 1.5, 0.6), k=5, gain_up 2.0, no smoothing)
EMOTIONAL_BOOSTED = ProsodyAttentionConfig(
    k_winners=5, weights=(1.2, 1.5, 0.6), gain_up=2.0, smoothing=0)

# the full grid the reference sweeps (tune_prosody_hyperparameters.py:120-193)
SWEEP_CONFIGS: Dict[str, ProsodyAttentionConfig] = {
    "baseline": ProsodyAttentionConfig(k_winners=5),
    "less_smoothing": ProsodyAttentionConfig(
        k_winners=5, smoothing=0, normalize_salience=False),
    "amplified_channels": ProsodyAttentionConfig(
        k_winners=5, weights=(1.5, 1.5, 1.5)),
    "k3_conservative": ProsodyAttentionConfig(
        k_winners=3, weights=(1.2, 1.2, 1.2), smoothing=1),
    "k7_aggressive": ProsodyAttentionConfig(
        k_winners=7, weights=(0.8, 0.8, 0.8), smoothing=0,
        normalize_salience=False),
    "emotional_boosted": EMOTIONAL_BOOSTED,
    "analytical_balanced": ProsodyAttentionConfig(
        k_winners=5, weights=(0.8, 1.2, 1.0), smoothing=2, gain_up=1.5),
}


def prosody_channels_from_tokens(token_ids: jax.Array
                                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Deterministic (amp, pitch, boundary) channels from token ids."""
    t = token_ids.astype(jnp.float32)
    amp = jnp.abs(jnp.sin(t * 0.1))
    pitch = jnp.abs(jnp.cos(t * 0.05))
    boundary = (jnp.sin(t * 0.3) > 0.8).astype(jnp.float32)
    return amp, pitch, boundary


def prosody_channels_from_strings(tokens) -> Tuple[np.ndarray, np.ndarray,
                                                   np.ndarray]:
    """Text-derived (amp, pitch, boundary) channels from token STRINGS.

    The reference's bridge acknowledges its trig-hash-of-ids channels are a
    GPU-side approximation and that "in a real pipeline" prosody should come
    from the text itself (/root/reference/src/core/language_zone/
    prosody_attention.py:22-24); its optimized bridge even passes token
    strings into the id-hash function (optimized_prosody_attention.py:124 —
    a latent type bug). This is that real pipeline, host-side and
    deterministic: emphasis (capitalization, exclamation) drives amplitude,
    word length drives pitch range, sentence punctuation marks boundaries.
    Returns [1, T] float32 arrays ready for
    `multi_channel_spiking_attention`.
    """
    amp, pitch, boundary = [], [], []
    for w in tokens:
        letters = [c for c in w if c.isalpha()]
        caps = (sum(c.isupper() for c in letters) / len(letters)
                if letters else 0.0)
        excl = min(w.count("!") + w.count("?"), 3) / 3.0
        amp.append(0.2 + 0.6 * caps + 0.4 * excl)
        pitch.append(0.3 + 0.7 * min(len(w) / 10.0, 1.0))
        boundary.append(1.0 if (w and w[-1] in ".,;:!?") else 0.0)
    mk = lambda v: np.asarray(v, np.float32)[None, :]
    return mk(amp), mk(pitch), mk(boundary)


def _lif_chain(x: jax.Array, decay: float, theta: float = 1.0) -> jax.Array:
    """Binary LIF with reset over [B, T] drive."""

    def step(v, xt):
        v = decay * v + xt
        s = (v >= theta).astype(x.dtype)
        return v - s * theta, s

    _, spikes = jax.lax.scan(step, jnp.zeros(x.shape[0], x.dtype),
                             jnp.moveaxis(x, 1, 0))
    return jnp.moveaxis(spikes, 0, 1)


def multi_channel_spiking_attention(
        amp: jax.Array, pitch: jax.Array, boundary: jax.Array,
        cfg: ProsodyAttentionConfig = ProsodyAttentionConfig()
) -> Dict[str, jax.Array]:
    """(amp, pitch, boundary) [B, T] → {'mu_scalar', 'salience', 'winners'}."""
    s = (cfg.weights[0] * _lif_chain(amp, cfg.decay[0])
         + cfg.weights[1] * _lif_chain(pitch, cfg.decay[1])
         + cfg.weights[2] * _lif_chain(boundary, cfg.decay[2]))

    if cfg.smoothing > 1:
        k = jnp.ones((cfg.smoothing,)) / cfg.smoothing
        s = jax.vmap(lambda row: jnp.convolve(row, k, mode="same"))(s)

    if cfg.normalize_salience:
        s = s / (s.max(axis=1, keepdims=True) + 1e-6)

    topk_vals, topk_idx = jax.lax.top_k(s, min(cfg.k_winners, s.shape[1]))
    avg_winner = topk_vals.mean(axis=1)
    mu = cfg.min_gain + (cfg.max_gain - cfg.min_gain) * jnp.tanh(
        cfg.gain_up * avg_winner)
    return {"mu_scalar": mu, "salience": s, "winners": topk_idx}


def prosody_attention_gains(token_ids: jax.Array,
                            cfg: ProsodyAttentionConfig =
                            ProsodyAttentionConfig()
                            ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """[B, T] ids → per-token gains mu·(1+salience) [B, T] + details."""
    amp, pitch, boundary = prosody_channels_from_tokens(token_ids)
    result = multi_channel_spiking_attention(amp, pitch, boundary, cfg)
    gains = result["mu_scalar"][:, None] * (1.0 + result["salience"])
    return gains, result


class CachedProsodyBridge:
    """Content-keyed LRU cache over the prosody channel computation."""

    def __init__(self, cfg: ProsodyAttentionConfig = ANALYTICAL_BALANCED,
                 cache_size: int = 256):
        self.cfg = cfg
        self.cache_size = cache_size
        self._cache: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0
        self._jit_gains = jax.jit(
            lambda ids: prosody_attention_gains(ids, self.cfg))

    def __call__(self, token_ids) -> jax.Array:
        ids = np.asarray(token_ids)
        key = hashlib.md5(ids.tobytes()).hexdigest()
        if key in self._cache:
            self.hits += 1
            self._cache.move_to_end(key)
            return self._cache[key]
        self.misses += 1
        gains, _ = self._jit_gains(jnp.asarray(ids))
        self._cache[key] = gains
        if len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)
        return gains

    @property
    def stats(self) -> Dict[str, float]:
        total = self.hits + self.misses
        return {"hits": self.hits, "misses": self.misses,
                "hit_rate": self.hits / total if total else 0.0}


def prosody_gif_scan(params: GIFParams, currents: jax.Array,
                     attention_gains: Optional[jax.Array] = None,
                     modulation_strength: float = 0.3,
                     state: Optional[Tuple[jax.Array, jax.Array]] = None
                     ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """GIF dynamics over [B, T, D] with per-timestep prosody modulation.

    gain g_t modulates: input (×g), effective threshold
    (θ·clamp(1 − 0.3(g−1), 0.5, 1.5)), and adaptation rate (α·g).
    """
    p = params
    B, T, D = currents.shape
    if attention_gains is None:
        attention_gains = jnp.ones((B, T), currents.dtype)
    if state is None:
        v0 = jnp.zeros((B, D), currents.dtype)
        th0 = jnp.full((B, D), p.threshold, currents.dtype)
    else:
        v0, th0 = state

    def step(carry, xs):
        v, theta = carry
        i_t, g_t = xs
        g = g_t[:, None]
        i_t = i_t * g
        v = v * p.decay + i_t
        thr_scale = jnp.clip(1.0 - modulation_strength * (g - 1.0),
                             0.5, 1.5)
        theta_eff = theta * thr_scale
        clamp = p.levels * theta_eff * 2.0
        v = jnp.clip(v, -clamp, clamp)
        spk = multi_bit_spike(v / (theta_eff + 1e-6), p.levels)
        v = v - spk * theta_eff
        alpha_eff = p.alpha * g
        theta = theta + alpha_eff * spk - alpha_eff * (theta - p.threshold)
        return (v, theta), spk

    (v, theta), spikes = jax.lax.scan(
        step, (v0, th0),
        (jnp.moveaxis(currents, 1, 0), jnp.moveaxis(attention_gains, 1, 0)))
    return jnp.moveaxis(spikes, 0, 1), (v, theta)


# ---------------------------------------------------------------------------
# Emotion-head → prosody integration
# ---------------------------------------------------------------------------
# The reference trains EmotionPersonalityHead but never wires it into the
# prosody pipeline (/root/reference/TODO.md:6, SURVEY §2.7). This closes
# that loop: emotion probabilities map onto the circumplex (arousal,
# valence) plane, modulating both the per-token attention gains and the
# [B, L, 4] prosody tensor the transformer's query gate consumes.

# circumplex-model coordinates for the 8 emotion classes
# (joy, sad, anger, fear, surprise, disgust, trust, neutral)
EMOTION_AROUSAL = (0.7, 0.3, 0.9, 0.8, 0.9, 0.6, 0.4, 0.2)
EMOTION_VALENCE = (0.8, -0.7, -0.8, -0.6, 0.3, -0.7, 0.6, 0.0)
# tone classes (formal, casual, urgent, calm) → gain multipliers
TONE_GAIN = (1.0, 1.0, 1.3, 0.8)


def emotion_modulated_prosody(token_ids: jax.Array, features: jax.Array,
                              head, head_params,
                              cfg: ProsodyAttentionConfig =
                              ANALYTICAL_BALANCED
                              ) -> Tuple[jax.Array, jax.Array,
                                         Dict[str, jax.Array]]:
    """Emotion-conditioned prosody.

    token_ids [B, T], features [B, T, D] (e.g. token embeddings) →
      gains   [B, T]    — spiking-attention gains scaled by arousal + tone,
      prosody [B, T, 4] — (arousal, valence, arousal, valence) per sample,
      info              — salience/winners + emotion posteriors.
    """
    pooled = features.mean(axis=1)
    logits = head.apply(head_params, pooled)
    p_emo = jax.nn.softmax(logits["emotion"], axis=-1)       # [B, 8]
    p_tone = jax.nn.softmax(logits["tone"], axis=-1)         # [B, 4]
    arousal = p_emo @ jnp.asarray(EMOTION_AROUSAL)           # [B]
    valence = p_emo @ jnp.asarray(EMOTION_VALENCE)           # [B]
    tone_gain = p_tone @ jnp.asarray(TONE_GAIN)              # [B]

    gains, info = prosody_attention_gains(token_ids, cfg)
    # arousal boosts, tone scales — clamped to the config's gain band
    gains = gains * (1.0 + 0.3 * jnp.tanh(arousal))[:, None]
    gains = jnp.clip(gains * tone_gain[:, None],
                     cfg.min_gain, cfg.max_gain * 1.5)

    B, T = token_ids.shape
    pros = jnp.stack([arousal, valence, arousal, valence], axis=-1)
    prosody = jnp.broadcast_to(pros[:, None, :], (B, T, 4))
    info = dict(info, emotion_probs=p_emo, arousal=arousal,
                valence=valence, tone_gain=tone_gain)
    return gains, prosody, info
