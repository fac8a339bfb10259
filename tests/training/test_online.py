"""Online-learning tests: Oja/neurogenesis, STDP, whitener, NLMS —
mirrors of the reference's hebbian/STDP/whitener test semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.training.online import (
    NLMSExpert,
    init_oja, init_stdp, init_whitener,
    oja_forward, oja_step,
    stdp_modulations, stdp_process_sequence,
    whiten, whiten_update,
)


class TestOja:
    def test_projection_shape(self, rng):
        st = init_oja(rng, 16, 4, max_components=8)
        y = oja_forward(st, jnp.ones((3, 16)))
        assert y.shape == (3, 8)
        assert np.all(np.asarray(y[:, 4:]) == 0)  # inactive masked

    def test_learns_dominant_direction(self, rng):
        st = init_oja(rng, 8, 1, max_components=4)
        v = np.zeros(8, np.float32)
        v[0] = 1.0
        data = np.outer(np.random.RandomState(0).randn(64), v).astype(np.float32)
        for _ in range(10):  # Oja converges over multiple epochs
            for i in range(0, 64, 8):
                st, _ = oja_step(st, jnp.asarray(data[i:i + 8]),
                                 0.1, 0.99, 1e9)
        w0 = np.asarray(st.W[:, 0])
        assert abs(abs(w0[0]) - 1.0) < 0.1  # aligned with the data direction

    def test_neurogenesis(self, rng):
        st = init_oja(rng, 8, 1, max_components=4)
        x = jnp.asarray(np.random.RandomState(1).randn(4, 8), jnp.float32) * 10
        st, _ = oja_step(st, x, 0.01, 0.0, 0.1)  # low threshold → grow
        assert int(st.K) == 2
        # new column is unit-norm
        assert abs(float(jnp.linalg.norm(st.W[:, 1])) - 1.0) < 1e-5

    def test_columns_stay_normalized(self, rng):
        st = init_oja(rng, 8, 3, max_components=4)
        for _ in range(5):
            st, _ = oja_step(st, jnp.ones((2, 8)), 0.1, 0.99, 1e9)
        norms = np.linalg.norm(np.asarray(st.W[:, :3]), axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestSTDP:
    def test_repeated_tokens_gain_weight(self):
        st = init_stdp(100)
        seq = jnp.asarray([[7, 7, 7, 7, 7, 7, 7, 7]])
        st2, stats = stdp_process_sequence(st, seq)
        assert float(st2.token_weights[7]) > float(st.token_weights[7]) * 0.99
        # unseen tokens only decay
        assert float(st2.token_weights[3]) < 0.5

    def test_clamped_to_bounds(self):
        st = init_stdp(10)
        seq = jnp.tile(jnp.asarray([[1]]), (1, 64))
        for _ in range(50):
            st, _ = stdp_process_sequence(st, seq)
        w = np.asarray(st.token_weights)
        assert w.max() <= 1.0 + 1e-6 and w.min() >= 0.0

    def test_modulations(self):
        st = init_stdp(10, init=0.5)
        m = stdp_modulations(st, jnp.asarray([[0, 1]]))
        np.testing.assert_allclose(np.asarray(m), 1.1, atol=1e-6)


class TestWhitener:
    def test_whitens_running_stats(self):
        st = init_whitener(4)
        rng = np.random.RandomState(0)
        data = rng.randn(200, 4).astype(np.float32) * 5 + 3
        for i in range(0, 200, 20):
            st, out = whiten_update(st, jnp.asarray(data[i:i + 20]), 0.1)
        w = np.asarray(whiten(st, jnp.asarray(data)))
        assert abs(w.mean()) < 0.5
        assert abs(w.std() - 1.0) < 0.5


class TestNLMS:
    def test_converges_on_linear_target(self):
        rng = np.random.RandomState(0)
        true_w = rng.randn(8).astype(np.float32)
        ex = NLMSExpert(8, lr=0.5)
        for _ in range(500):
            x = rng.randn(8).astype(np.float32)
            ex.update(x, float(np.dot(true_w, x)))
        x = rng.randn(8).astype(np.float32)
        assert abs(ex.predict(x) - np.dot(true_w, x)) < 0.3
