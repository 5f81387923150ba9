"""Layer-library unit tests vs NumPy oracles (SURVEY.md §4: KShift/QR index
math vs a NumPy oracle; hashing semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendations_tpu.nn import (
    FlatEmbedding,
    QREmbedding,
    KShiftEmbedding,
    HistogramEmbedding,
    PatternFromTimelocal,
    MLP,
    kshift_row_indices,
    quick_gelu,
    l2_normalize,
    cap_gradients,
)


def _ids(n=16):
    rs = np.random.RandomState(1)
    return jnp.asarray(
        rs.randint(-(2**63), 2**63 - 1, size=(n,), dtype=np.int64)
    )


def test_kshift_row_indices_oracle():
    """rotl64(id, c) mod N against a pure-NumPy uint64 oracle."""
    ids = _ids()
    n_emb, k = 1000003, 5
    got = np.asarray(kshift_row_indices(ids, n_emb, k))
    u = np.asarray(ids).astype(np.uint64)
    for c in range(k):
        if c == 0:
            rot = u
        else:
            rot = (u << np.uint64(c)) | (u >> np.uint64(64 - c))
        want = (rot % np.uint64(n_emb)).astype(np.int64)
        np.testing.assert_array_equal(got[:, c], want)


def test_kshift_forward_is_sum_of_rows():
    ids = _ids(8)
    mod = KShiftEmbedding(num_embeddings=512, features=16, num_shifts=4)
    vs = mod.init(jax.random.PRNGKey(0), ids)
    out = mod.apply(vs, ids)
    table = np.asarray(vs["params"]["embedding"])
    idx = np.asarray(kshift_row_indices(ids, 512, 4))
    want = table[idx].sum(axis=1) / np.sqrt(4)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_kshift_normalized_output():
    ids = _ids(8)
    mod = KShiftEmbedding(num_embeddings=512, features=16, num_shifts=4, normalize_output=True)
    vs = mod.init(jax.random.PRNGKey(0), ids)
    out = np.asarray(mod.apply(vs, ids))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_flat_embedding_remainder_semantics():
    """Negative int64 ids must map to non-negative rows (torch.remainder)."""
    mod = FlatEmbedding(num_embeddings=97, features=8)
    ids = jnp.asarray([-1, -97, 0, 96, 98, -(2**62)], dtype=jnp.int64)
    vs = mod.init(jax.random.PRNGKey(0), ids)
    out = mod.apply(vs, ids)
    table = np.asarray(vs["params"]["embedding"])
    want_rows = np.asarray(ids) % 97  # python % matches torch.remainder for +ve mod
    np.testing.assert_allclose(np.asarray(out), table[want_rows], rtol=1e-6)


def test_qr_embedding_oracle():
    n = 1000
    mod = QREmbedding(num_embeddings=n, features=8)
    ids = _ids(32)
    vs = mod.init(jax.random.PRNGKey(0), ids)
    out = np.asarray(mod.apply(vs, ids))
    div = int(np.sqrt(n))
    x = np.asarray(ids) % (div * div)
    q, r = (x // div) % div, x % div
    tq = np.asarray(vs["params"]["emb_q"])
    tr = np.asarray(vs["params"]["emb_r"])
    np.testing.assert_allclose(out, tq[q] + tr[r], rtol=1e-5)


def test_histogram_embedding_bins():
    mod = HistogramEmbedding(lo=0.0, hi=1.0, num_bins=10, features=4)
    x = jnp.asarray([-0.5, 0.0, 0.05, 0.55, 0.999, 1.0, 2.0])
    vs = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(vs, x))
    table = np.asarray(vs["params"]["embedding"])
    want = table[[0, 0, 0, 5, 9, 9, 9]]
    np.testing.assert_allclose(out, want)


def test_pattern_from_timelocal():
    """hour-of-day / day-of-week index math (reference commons/layers.py:14-41)."""
    t = jnp.asarray([0, 3600, 86400 + 7200, 7 * 86400], dtype=jnp.int64)
    hod = PatternFromTimelocal(div=3600, mod=24, features=4)
    vs = hod.init(jax.random.PRNGKey(0), t)
    out = np.asarray(hod.apply(vs, t))
    table = np.asarray(vs["params"]["embedding"])
    np.testing.assert_allclose(out, table[[0, 1, 2, 0]])

    dow_idx = PatternFromTimelocal(div=86400, mod=7, features=0)
    vs2 = dow_idx.init(jax.random.PRNGKey(0), t)
    np.testing.assert_array_equal(np.asarray(dow_idx.apply(vs2, t)), [0, 0, 1, 0])


def test_quick_gelu():
    x = jnp.linspace(-3, 3, 7)
    want = np.asarray(x) * (1.0 / (1.0 + np.exp(-1.702 * np.asarray(x))))
    np.testing.assert_allclose(np.asarray(quick_gelu(x)), want, rtol=1e-6)


def test_l2_normalize_zero_safe():
    x = jnp.zeros((3, 4))
    out = np.asarray(l2_normalize(x))
    assert np.isfinite(out).all()


def test_cap_gradients():
    x = jnp.asarray([3.0, 4.0])
    g = jax.grad(lambda v: jnp.sum(cap_gradients(v) * jnp.asarray([30.0, 40.0])))(x)
    np.testing.assert_allclose(np.asarray(g), [0.6, 0.8], rtol=1e-6)


def test_mlp_shapes():
    mod = MLP(out_dim=5, gate_sizes=(8, 8))
    x = jnp.ones((2, 3))
    vs = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(vs, x).shape == (2, 5)
