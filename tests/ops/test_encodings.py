"""Theta-gamma + place-cell encoding tests — mirrors of the reference's
test_theta_gamma_encoding.py (375 LoC: PAC/stability) and
test_place_cell_encoder.py (432 LoC: sparsity/reconstruction/grad)."""

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.ops.place_cells import place_cell_encode, sparse_place_code
from aura_snn_rag_tpu.ops.theta_gamma import init_theta_gamma, theta_gamma_encoding


class TestThetaGamma:
    def test_shape_and_bounds(self, rng):
        p = init_theta_gamma(rng, 64)
        pos = jnp.arange(16)[None, :]
        enc = theta_gamma_encoding(p, pos, max_seq_len=512)
        assert enc.shape == (1, 16, 64)
        # theta in [-1,1], gamma amp in [0,1]·0.5 → |enc| <= 1.5·|amp|
        assert jnp.max(jnp.abs(enc)) <= 1.5 + 1e-5

    def test_generation_stability(self, rng):
        """Fixed max_seq_len normalization: position p encodes identically
        whether computed inside a short or a long window
        (theta_gamma_encoding.py:53 rationale)."""
        p = init_theta_gamma(rng, 32)
        enc_a = theta_gamma_encoding(p, jnp.arange(8), max_seq_len=512)
        enc_b = theta_gamma_encoding(p, jnp.arange(128), max_seq_len=512)
        np.testing.assert_allclose(enc_a, enc_b[:8], rtol=1e-6)

    def test_pac_structure(self, rng):
        """Gamma amplitude should be maximal where cos(theta phase)=1."""
        p = init_theta_gamma(rng, 4)._replace(
            theta_offsets=jnp.zeros(4), gamma_offsets=jnp.zeros(4),
            amplitude=jnp.ones(4))
        enc0 = theta_gamma_encoding(p, jnp.array([0]), max_seq_len=512)
        # At position 0 with zero offsets: theta=sin(0)=0, gamma amp=(cos0+1)/2=1
        # enc = 0 + 0.5*1*sin(0) = 0
        np.testing.assert_allclose(enc0, 0.0, atol=1e-6)

    def test_gradients(self, rng):
        p = init_theta_gamma(rng, 16)
        g = jax.grad(lambda pp: jnp.sum(
            theta_gamma_encoding(pp, jnp.arange(8), 512) ** 2))(p)
        for leaf in jax.tree.leaves(g):
            assert jnp.all(jnp.isfinite(leaf))


class TestPlaceCells:
    def test_sparsity_exact_k(self, rng):
        logits = jax.random.normal(rng, (4, 8, 1000))
        act = sparse_place_code(logits, k=30)
        nonzero = jnp.sum(act > 0, axis=-1)
        np.testing.assert_array_equal(nonzero, 30)

    def test_activity_range(self, rng):
        logits = jax.random.normal(rng, (2, 4, 200)) * 5
        act = sparse_place_code(logits, 6)
        assert jnp.all(act >= 0) and jnp.all(act <= 1)

    def test_winners_are_topk(self, rng):
        logits = jax.random.normal(rng, (100,))
        act = sparse_place_code(logits, 5)
        top_idx = np.argsort(np.asarray(logits))[-5:]
        assert set(np.nonzero(np.asarray(act))[0]) == set(top_idx)

    def test_full_encode_residual(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        D, N = 32, 128
        emb = jax.random.normal(k1, (2, 4, D))
        w_proj = jax.random.normal(k2, (D, N)) * 0.1
        w_back = jax.random.normal(k3, (N, D)) * 0.1
        out, act = place_cell_encode(emb, w_proj, jnp.zeros(N),
                                     w_back, jnp.zeros(D), k=4)
        assert out.shape == emb.shape and act.shape == (2, 4, N)
        # residual structure: out ≈ emb + 0.1·recon → close to emb
        assert jnp.max(jnp.abs(out - emb)) < 1.0

    def test_gradients_flow_through_sparse_path(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        D, N = 16, 64
        w_proj = jax.random.normal(k2, (D, N)) * 0.1

        def loss(w):
            emb = jax.random.normal(k1, (2, 3, D))
            out, act = place_cell_encode(emb, w, jnp.zeros(N),
                                         jax.random.normal(k3, (N, D)) * 0.1,
                                         jnp.zeros(D), k=4)
            return jnp.sum(out ** 2) + jnp.sum(act)

        g = jax.grad(loss)(w_proj)
        assert jnp.any(g != 0) and jnp.all(jnp.isfinite(g))
