"""Neuron dynamics tests — mirror of the reference's
tests/core/language_zone/test_gif_neuron.py, test_balanced_gif_neuron.py and
tests/test_izhikevich.py semantics (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.ops.neurons import (
    adex_params, adex_scan,
    gif_params, gif_scan,
    izhikevich_params, izhikevich_scan,
    leaky_integrate,
    lif_params, lif_scan,
)
from aura_snn_rag_tpu.ops.surrogate import multi_bit_spike, heaviside_spike


class TestGIF:
    def test_shapes_and_multibit_range(self):
        p = gif_params(levels=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 32)) * 3.0
        spikes, (v, theta) = gif_scan(p, x)
        assert spikes.shape == (4, 8, 32)
        assert v.shape == (4, 32) and theta.shape == (4, 32)
        # Multi-bit spikes are integers in [0, L]
        assert jnp.all(spikes >= 0) and jnp.all(spikes <= 16)
        np.testing.assert_allclose(spikes, jnp.round(spikes))

    def test_strong_drive_spikes(self):
        p = gif_params(levels=16)
        x = jnp.ones((2, 10, 16)) * 5.0
        spikes, _ = gif_scan(p, x)
        assert jnp.sum(spikes) > 0

    def test_gradient_flows(self):
        p = gif_params(levels=8)

        def loss(x):
            s, _ = gif_scan(p, x)
            return jnp.sum(s ** 2)

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8)) * 2.0
        g = jax.grad(loss)(x)
        assert g.shape == x.shape
        assert jnp.all(jnp.isfinite(g))
        assert jnp.any(g != 0)

    def test_adaptive_threshold_rises_under_drive(self):
        p = gif_params(levels=16, alpha=0.1)
        x = jnp.ones((1, 20, 4)) * 5.0
        _, (_, theta) = gif_scan(p, x)
        assert jnp.all(theta > 1.0)  # spiking raises theta above baseline

    def test_state_threading(self):
        p = gif_params()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8))
        s_full, st_full = gif_scan(p, x)
        s1, st1 = gif_scan(p, x[:, :3])
        s2, st2 = gif_scan(p, x[:, 3:], state=st1)
        np.testing.assert_allclose(s_full, jnp.concatenate([s1, s2], axis=1),
                                   rtol=1e-5, atol=1e-5)


class TestMultiBitSurrogate:
    def test_forward_floor_clip(self):
        v = jnp.array([-1.0, 0.2, 1.7, 5.9, 30.0])
        out = multi_bit_spike(v, 16.0)
        np.testing.assert_allclose(out, [0.0, 0.0, 1.0, 5.0, 16.0])

    def test_triangular_ste(self):
        # grad = clip(1-2*|v-round(v)|,0,1) * in_range
        g = jax.grad(lambda v: jnp.sum(multi_bit_spike(v, 16.0)))(
            jnp.array([0.5, 1.0, 1.25, -2.0, 20.0]))
        np.testing.assert_allclose(g, [0.0, 1.0, 0.5, 0.0, 0.0], atol=1e-6)


class TestLIF:
    def test_spike_and_reset(self):
        p = lif_params(4, beta=0.5, threshold=0.6)
        x = jnp.ones((1, 5, 4)) * 1.0  # above threshold every step
        spikes, mem = lif_scan(p, x)
        assert jnp.all(spikes[:, 0] == 1.0)  # first step: mem=1.0 > 0.6
        assert jnp.all(jnp.isfinite(mem))

    def test_subthreshold_silent(self):
        p = lif_params(4, beta=0.5, threshold=10.0)
        x = jnp.ones((1, 5, 4)) * 0.1
        spikes, _ = lif_scan(p, x)
        assert jnp.sum(spikes) == 0

    def test_surrogate_slope_grad(self):
        p = lif_params(8)

        def loss(params):
            s, _ = lif_scan(params, jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8)))
            return jnp.sum(s)

        g = jax.grad(loss)(p)
        assert g.slope.shape == (8,)
        assert jnp.all(jnp.isfinite(g.slope))


class TestIzhikevich:
    def test_regular_spiking_fires(self):
        p = izhikevich_params()  # RS defaults a=0.02 b=0.2 c=-65 d=6
        x = jnp.ones((1, 400, 1)) * 10.0
        spikes, (v, u) = izhikevich_scan(p, x)
        assert jnp.sum(spikes) > 1  # sustained drive → repeated firing
        assert jnp.all(jnp.isfinite(v))

    def test_no_input_silent(self):
        p = izhikevich_params()
        x = jnp.zeros((1, 100, 2))
        spikes, _ = izhikevich_scan(p, x)
        assert jnp.sum(spikes) == 0


class TestAdEx:
    def test_fires_under_drive(self):
        p = adex_params()
        x = jnp.ones((1, 500, 1)) * 40.0
        spikes, (V, w) = adex_scan(p, x)
        assert jnp.sum(spikes) > 0
        assert jnp.all(jnp.isfinite(V))


class TestLeakyIntegrate:
    def test_matches_scan(self):
        decay = 0.9
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 4))
        got = leaky_integrate(jnp.asarray(decay), x)

        def step(v, xt):
            v = decay * v + xt
            return v, v

        _, want = jax.lax.scan(step, jnp.zeros((2, 4)), jnp.moveaxis(x, 1, 0))
        np.testing.assert_allclose(got, jnp.moveaxis(want, 0, 1), rtol=1e-5, atol=1e-6)
