"""Fused-head flash attention (ops/fused_attention) vs dense oracle —
forward AND backward (custom VJP), interpret mode on CPU (SURVEY.md §4
'Pallas kernels vs pure-jnp references')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendations_tpu.ops.fused_attention import fused_flash_attention


def _dense_folded(q, k, v, n_head, causal):
    """Oracle on the folded (B, T, H*hd) layout."""
    b, t, qc = q.shape
    hd = qc // n_head
    qh = q.reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
    if k.shape[-1] == hd:
        kh = k[:, None, :, :]
        vh = v[:, None, :, :]
        kh = jnp.broadcast_to(kh, qh.shape)
        vh = jnp.broadcast_to(vh, qh.shape)
    else:
        kh = k.reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    if causal:
        s = jnp.where(jnp.tril(jnp.ones((t, t), bool)), s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, t, qc)


def _make(b, t, n_head, hd, kvh, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, n_head * hd), jnp.float32)
    kc = hd if kvh == 1 else n_head * hd
    k = jax.random.normal(kk, (b, t, kc), jnp.float32)
    v = jax.random.normal(kv_, (b, t, kc), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kvh", [1, 4])
def test_fused_forward_matches_dense(causal, kvh):
    b, t, n_head, hd = 2, 96, 4, 16
    q, k, v = _make(b, t, n_head, hd, kvh)
    got = fused_flash_attention(q, k, v, n_head, causal, 32, True)
    want = _dense_folded(q, k, v, n_head, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_forward_unaligned_seq():
    """T not a multiple of the tile: row padding + key-length mask."""
    b, t, n_head, hd = 1, 70, 2, 16
    q, k, v = _make(b, t, n_head, hd, 1, seed=3)
    got = fused_flash_attention(q, k, v, n_head, True, 32, True)
    want = _dense_folded(q, k, v, n_head, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kvh", [1, 4])
def test_fused_grads_match_dense(causal, kvh):
    """Custom-VJP dq/dk/dv against autodiff through the dense oracle."""
    b, t, n_head, hd = 2, 70, 4, 16
    q, k, v = _make(b, t, n_head, hd, kvh, seed=7)
    key = jax.random.PRNGKey(11)
    cot = jax.random.normal(key, q.shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_flash_attention(q, k, v, n_head, causal, 32, True) * cot)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_folded(q, k, v, n_head, causal) * cot)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("kvh", [1, 4])
def test_fused_grads_single_tile_path(kvh):
    """tile=None auto-sizes to one whole-sequence tile (T<=512), exercising
    the merged dq+dk+dv backward kernel."""
    b, t, n_head, hd = 2, 70, 4, 16
    q, k, v = _make(b, t, n_head, hd, kvh, seed=5)
    cot = jax.random.normal(jax.random.PRNGKey(13), q.shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_flash_attention(q, k, v, n_head, True, None, True) * cot)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_folded(q, k, v, n_head, True) * cot)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_long_seq_chunked_path():
    """T large enough that the in-kernel KV_CHUNK loop runs >1 chunk (both
    forward online-softmax and the chunked dq/dkv backward)."""
    b, t, n_head, hd = 1, 700, 2, 16
    q, k, v = _make(b, t, n_head, hd, 1, seed=21)
    cot = jax.random.normal(jax.random.PRNGKey(22), q.shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_flash_attention(q, k, v, n_head, True, 128, True) * cot)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_folded(q, k, v, n_head, True) * cot)

    got_o = fused_flash_attention(q, k, v, n_head, True, 128, True)
    want_o = _dense_folded(q, k, v, n_head, True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), rtol=2e-4, atol=2e-4)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kvh", [1, 2])
def test_fused_grid_path_seq1100(causal, kvh):
    """Default tiling at T>1024: the 3D-grid kernels (kv chunks as an
    innermost grid axis with scratch-carried softmax state) — forward and
    custom-VJP backward vs the dense oracle, including row padding."""
    b, t, n_head, hd = 1, 1100, 2, 16
    q, k, v = _make(b, t, n_head, hd, kvh, seed=31)
    cot = jax.random.normal(jax.random.PRNGKey(32), q.shape, jnp.float32)

    got_o = fused_flash_attention(q, k, v, n_head, causal, None, True)
    want_o = _dense_folded(q, k, v, n_head, causal)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), rtol=2e-4, atol=2e-4)

    def loss_fused(q, k, v):
        return jnp.sum(fused_flash_attention(q, k, v, n_head, causal, None, True) * cot)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_folded(q, k, v, n_head, causal) * cot)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_grad_of_mean_pooled_output():
    """End-to-end shaped like the LTHM usage: grad flows through a reduction."""
    b, t, n_head, hd = 2, 40, 2, 8
    q, k, v = _make(b, t, n_head, hd, 1, seed=9)

    def f(q, k, v):
        return jnp.mean(fused_flash_attention(q, k, v, n_head, True, 16, True) ** 2)

    def f_ref(q, k, v):
        return jnp.mean(_dense_folded(q, k, v, n_head, True) ** 2)

    got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4)


def test_fused_grid_path_seq1024_wide_chunk():
    """t_pad=1024 is the padding tie between 256- and 512-wide KV chunks;
    the tie-break selects the 512-wide chunk, a path no other test reaches
    after the adaptive chunk-width change (ADVICE r2)."""
    from recommendations_tpu.ops.fused_attention import _pad_args

    b, t, n_head, hd = 1, 1024, 2, 16
    q, k, v = _make(b, t, n_head, hd, 1, seed=41)
    # guard: default tiling must actually resolve to the wide chunk
    *_, kc_size = _pad_args(q, k, v, n_head, 256)
    assert kc_size == 512, f"tie-break regressed: kc={kc_size}"
    cot = jax.random.normal(jax.random.PRNGKey(42), q.shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_flash_attention(q, k, v, n_head, True, None, True) * cot)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_folded(q, k, v, n_head, True) * cot)

    got_o = fused_flash_attention(q, k, v, n_head, True, None, True)
    want_o = _dense_folded(q, k, v, n_head, True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), rtol=2e-4, atol=2e-4)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("causal", [True, False])
def test_packed_mqa_paths_match_dense(causal, monkeypatch):
    """The flag-gated MQA head-packed kernels (measured slower on v5e,
    kept for the record — ops/fused_attention.py module comment) must stay
    numerically correct: forward, backward, and the >16-head split path."""
    import recommendations_tpu.ops.fused_attention as fa

    monkeypatch.setattr(fa, "_PACK_FWD", True)
    monkeypatch.setattr(fa, "_PACK_BWD", True)
    b, t, n_head, hd = 2, 48, 32, 4  # 32 heads: exercises the 16-head split
    q, k, v = _make(b, t, n_head, hd, 1, seed=7)
    got = fa.fused_flash_attention(q, k, v, n_head, causal, None, True)
    want = _dense_folded(q, k, v, n_head, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    cot = jax.random.normal(jax.random.PRNGKey(9), got.shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fa.fused_flash_attention(q, k, v, n_head, causal, None, True) * cot)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_folded(q, k, v, n_head, causal) * cot)

    got_g = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want_g = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4)
