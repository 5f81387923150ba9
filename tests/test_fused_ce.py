"""Fused contrastive CE (ops/fused_ce) vs the XLA implementation
(models/lthm/loss.py:_ce_core) — ce, rank, and dq/dc grads, interpret mode
on CPU. The XLA path stays in the tree as this oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendations_tpu.models.lthm.loss import _ce_core
from recommendations_tpu.ops.fused_ce import fused_contrastive_ce


def _make(n, d, s, seed=0, invalid_frac=0.2):
    key = jax.random.PRNGKey(seed)
    kq, kc, kv, kl = jax.random.split(key, 4)
    q = jax.random.normal(kq, (n, d), jnp.float32)
    c = jax.random.normal(kc, (n, d), jnp.float32)
    q = (q / jnp.linalg.norm(q, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    c = (c / jnp.linalg.norm(c, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    v = jax.random.uniform(kv, (n,)) > invalid_frac
    lq = -jnp.abs(jax.random.normal(kl, (n,), jnp.float32)) * 3.0
    return q, c, v, lq


@pytest.mark.parametrize("n,s,tile,chunk", [
    (64, 8, 32, 32),        # multi-tile, square
    (96, 12, 32, 48),       # tile != chunk
    (100, 10, 32, 64),      # row padding (n_pad=128... lcm -> 192)
])
def test_fused_ce_matches_xla(n, s, tile, chunk):
    d, inv_t, beta = 16, 20.0, 1.0
    q, c, v, lq = _make(n, d, s)
    # oracle in f32: _ce_core stores logits in the operand dtype (bf16 on
    # the hot path) while the kernel keeps the tile in f32 VMEM for free —
    # the f32 oracle is the common reference both round toward
    ce_w, rank_w = _ce_core(
        q.astype(jnp.float32), c.astype(jnp.float32), v, lq, s, inv_t, beta
    )
    ce_g, rank_g = fused_contrastive_ce(q, c, v, lq, s, inv_t, beta, tile, chunk, True)
    w = np.asarray(v)
    np.testing.assert_allclose(
        np.asarray(ce_g)[w], np.asarray(ce_w)[w], rtol=2e-5, atol=2e-5
    )
    # rank can differ on exact logit==diag ties (MXU dot vs VPU row-dot);
    # none occur at these seeds
    np.testing.assert_array_equal(np.asarray(rank_g)[w], np.asarray(rank_w)[w])


def test_fused_ce_fully_masked_row_finite():
    """A row whose user-block is everything valid (no cross-user negatives)
    still yields finite ce on the valid side and huge-but-finite on invalid
    diagonals, exactly like the oracle."""
    n, d, s = 32, 8, 32  # single user block: every off-diagonal masked
    q, c, v, lq = _make(n, d, s, invalid_frac=0.0)
    ce_w, _ = _ce_core(q.astype(jnp.float32), c.astype(jnp.float32), v, lq, s, 10.0, 0.5)
    ce_g, _ = fused_contrastive_ce(q, c, v, lq, s, 10.0, 0.5, 32, 32, True)
    np.testing.assert_allclose(np.asarray(ce_g), np.asarray(ce_w), rtol=2e-5, atol=2e-5)
    assert np.isfinite(np.asarray(ce_g)).all()


@pytest.mark.parametrize("n,s,tile,chunk", [
    (64, 8, 32, 32),
    (100, 10, 32, 64),
])
def test_fused_ce_grads_match_xla(n, s, tile, chunk):
    d, inv_t, beta = 16, 20.0, 1.0
    q, c, v, lq = _make(n, d, s, seed=7)
    w = jax.random.uniform(jax.random.PRNGKey(3), (n,))
    w = w * v  # invalid rows get zero weight, as the caller does

    def loss_fused(q, c):
        ce, _ = fused_contrastive_ce(q, c, v, lq, s, inv_t, beta, tile, chunk, True)
        return jnp.sum(jnp.where(jnp.isfinite(ce), ce, 0.0) * w)

    def loss_xla(q, c):
        ce, _ = _ce_core(
            q.astype(jnp.float32), c.astype(jnp.float32), v, lq, s, inv_t, beta
        )
        return jnp.sum(jnp.where(jnp.isfinite(ce), ce, 0.0) * w)

    got = jax.grad(loss_fused, argnums=(0, 1))(q, c)
    want = jax.grad(loss_xla, argnums=(0, 1))(q, c)
    for g, ww, name in zip(got, want, ["dq", "dc"]):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(ww, np.float32),
            rtol=2e-2, atol=2e-2, err_msg=f"{name} mismatch",
        )
