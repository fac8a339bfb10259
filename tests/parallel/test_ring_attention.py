"""Ring attention (sequence/context parallelism) on the virtual 8-dev mesh.

Closes the SURVEY §2.8 SP/CP row: exact equivalence (forward AND gradients)
vs unsharded causal attention, non-causal mode, and composition with a
batch ('data') axis. The reference has nothing comparable (single device).
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aura_snn_rag_tpu.parallel.ring_attention import (
    ring_attention, sequence_sharded_attention)


def _mesh(shape, names):
    devs = np.array(jax.devices()[:int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _reference(q, k, v, causal=True):
    """Plain softmax attention in f64-ish f32 (no flash), causal mask."""
    B, L, H, Dh = q.shape
    s = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32),
                   k.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * Dh ** -0.5
    if causal:
        mask = jnp.tril(jnp.ones((L, L), bool))
        s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", p, v.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)


def _qkv(B=2, L=64, H=4, Dh=16, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.fast
def test_ring_matches_full_causal():
    mesh = _mesh((4,), ("seq",))
    q, k, v = _qkv()
    out = sequence_sharded_attention(q, k, v, mesh, seq_axis="seq",
                                     batch_axes=())
    ref = _reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_ring_matches_full_noncausal():
    mesh = _mesh((4,), ("seq",))
    q, k, v = _qkv(seed=3)
    out = sequence_sharded_attention(q, k, v, mesh, seq_axis="seq",
                                     batch_axes=(), causal=False)
    ref = _reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_ring_composes_with_data_axis():
    mesh = _mesh((2, 4), ("data", "seq"))
    q, k, v = _qkv(B=4, L=32, seed=5)
    out = sequence_sharded_attention(q, k, v, mesh)
    ref = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    # output sharding follows the input spec
    shd = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(mesh, P(("data",), "seq")))
    np.testing.assert_allclose(np.asarray(shd(out)), np.asarray(out))


def test_ring_gradients_match():
    """Grads through scan + ppermute must equal full-attention grads."""
    mesh = _mesh((4,), ("seq",))
    q, k, v = _qkv(L=32, seed=7)
    tgt = jnp.asarray(np.random.RandomState(9)
                      .randn(*q.shape).astype(np.float32))

    def loss_ring(q, k, v):
        out = sequence_sharded_attention(q, k, v, mesh, batch_axes=())
        return jnp.mean((out - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.mean((_reference(q, k, v) - tgt) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_ring_uneven_heads_long_seq():
    """Larger L per shard + odd head count; jit end-to-end."""
    mesh = _mesh((8,), ("seq",))
    q, k, v = _qkv(B=1, L=128, H=3, Dh=8, seed=11)
    fn = jax.jit(functools.partial(sequence_sharded_attention, mesh=mesh,
                                   batch_axes=()))
    out = fn(q, k, v)
    ref = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_ring_e2e_transformer_block():
    """A full pre-norm transformer block (LN -> QKV proj -> ring attention
    -> out proj -> residual -> MLP) runs sequence-sharded under shard_map
    and matches the unsharded block: tokenwise ops shard trivially, ring
    attention supplies the only cross-shard communication."""
    import jax
    from jax.sharding import NamedSharding

    mesh = _mesh((4,), ("seq",))
    B, L, H, Dh = 2, 64, 4, 16
    D = H * Dh
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    Wq, Wk, Wv, Wo = (jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.05)
                      for _ in range(4))
    W1 = jnp.asarray(rng.randn(D, 2 * D).astype(np.float32) * 0.05)
    W2 = jnp.asarray(rng.randn(2 * D, D).astype(np.float32) * 0.05)

    def ln(h):
        mu = h.mean(-1, keepdims=True)
        var = h.var(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-6)

    def block(x, attn_fn):
        h = ln(x)
        q = (h @ Wq).reshape(B, -1, H, Dh)
        k = (h @ Wk).reshape(B, -1, H, Dh)
        v = (h @ Wv).reshape(B, -1, H, Dh)
        ctx = attn_fn(q, k, v).reshape(B, -1, D)
        x = x + ctx @ Wo
        return x + jax.nn.gelu(ln(x) @ W1) @ W2

    ref = block(x, lambda q, k, v: _reference(q, k, v).astype(q.dtype))

    spec = P(None, "seq")
    sharded_block = jax.shard_map(
        lambda xs: block(xs, functools.partial(ring_attention,
                                               axis_name="seq")),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    out = sharded_block(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)
