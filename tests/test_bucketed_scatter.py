"""Bucketed scatter-add / gather_rows VJP vs plain XLA scatter oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendations_tpu.ops.bucketed_scatter import (
    bucketed_scatter_add,
    gather_rows,
    plain_scatter_add,
)


def _oracle(idx, rows, v):
    out = np.zeros((v, rows.shape[-1]), np.float32)
    np.add.at(out, np.asarray(idx), np.asarray(rows, np.float32))
    return out


def test_uniform_indices_match_plain():
    rs = np.random.RandomState(0)
    v, n, d = 300_000, 4096, 16
    idx = jnp.asarray(rs.randint(0, v, size=n).astype(np.int32))
    rows = jnp.asarray(rs.randn(n, d), jnp.float32)
    got = jax.jit(lambda i, r: bucketed_scatter_add(i, r, v, bucket_rows=65536))(idx, rows)
    np.testing.assert_allclose(np.asarray(got), _oracle(idx, rows, v), rtol=1e-5, atol=1e-5)


def test_skewed_indices_trigger_fallback():
    """All updates land on 3 rows of one bucket — capacity overflows, the
    lax.cond fallback must keep the result exact."""
    rs = np.random.RandomState(1)
    v, n, d = 300_000, 4096, 8
    idx = jnp.asarray(rs.choice([7, 8, 9], size=n).astype(np.int32))
    rows = jnp.asarray(rs.randn(n, d), jnp.float32)
    got = jax.jit(lambda i, r: bucketed_scatter_add(i, r, v, bucket_rows=65536))(idx, rows)
    np.testing.assert_allclose(np.asarray(got), _oracle(idx, rows, v), rtol=1e-4, atol=1e-4)


def test_bucket_boundary_indices():
    """Indices exactly at bucket edges must not leak across buckets."""
    v, d = 200_000, 4
    idx = jnp.asarray(
        np.array([0, 65535, 65536, 65537, 131071, 131072, 199999, 65536], np.int32)
    )
    rows = jnp.asarray(np.arange(8 * d, dtype=np.float32).reshape(8, d))
    got = jax.jit(lambda i, r: bucketed_scatter_add(i, r, v, bucket_rows=65536))(idx, rows)
    np.testing.assert_allclose(np.asarray(got), _oracle(idx, rows, v), rtol=1e-6, atol=1e-6)


def test_single_bucket_falls_back_to_plain():
    rs = np.random.RandomState(2)
    v, n, d = 1024, 512, 8
    idx = jnp.asarray(rs.randint(0, v, size=n).astype(np.int32))
    rows = jnp.asarray(rs.randn(n, d), jnp.float32)
    got = bucketed_scatter_add(idx, rows, v)
    want = plain_scatter_add(idx, rows, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape", [(4096,), (64, 64), (16, 16, 16)])
def test_gather_rows_grad_matches_take(shape):
    rs = np.random.RandomState(3)
    v, d = 300_000, 8
    table = jnp.asarray(rs.randn(v, d), jnp.float32)
    idx = jnp.asarray(rs.randint(0, v, size=shape).astype(np.int64))
    cot = jnp.asarray(rs.randn(*shape, d), jnp.float32)

    def f(t):
        return jnp.sum(gather_rows(t, idx) * cot)

    def f_ref(t):
        return jnp.sum(jnp.take(t, idx.astype(jnp.int32), axis=0) * cot)

    np.testing.assert_allclose(np.asarray(f(table)), np.asarray(f_ref(table)), rtol=1e-6)
    g = jax.grad(f)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-5)
