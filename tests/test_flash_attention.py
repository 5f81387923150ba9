"""Pallas flash attention vs dense jnp reference (interpret mode on CPU —
SURVEY.md §4 'Pallas kernels vs pure-jnp references')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendations_tpu.ops.flash_attention import flash_attention


def _dense_attention(q, k, v, causal):
    b, h, t, d = q.shape
    if k.shape[1] == 1:
        k = jnp.broadcast_to(k, q.shape)
        v = jnp.broadcast_to(v, q.shape)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kvh", [1, 2])
def test_flash_matches_dense(causal, kvh):
    b, h, t, d = 2, 2, 256, 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, kvh, t, d), jnp.float32)
    v = jax.random.normal(kv_, (b, kvh, t, d), jnp.float32)
    got = flash_attention(q, k, v, causal=causal, interpret=True)
    want = _dense_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_unaligned_seq_and_dim():
    """T not a multiple of the tile and D < 128 must pad correctly."""
    b, h, t, d = 1, 2, 200, 16
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, 1, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, 1, t, d), jnp.float32)
    got = flash_attention(q, k, v, causal=True, interpret=True)
    want = _dense_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
