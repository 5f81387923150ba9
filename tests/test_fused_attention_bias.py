"""Pos-bias fused flash attention (ops/fused_attention_bias) vs a dense
oracle — forward, dq/dk/dv, AND the in-kernel diagonal-reduced table
gradient, interpret mode on CPU (SURVEY.md §4 'Pallas kernels vs pure-jnp
references').

The kernel applies the expanded bias at bf16 precision, so the oracle is
evaluated AT the bf16-rounded table (rounding applied outside the oracle:
differentiating through astype(bf16) would bf16-round the cotangent too,
which the kernel's straight-through table grad deliberately does not).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendations_tpu.ops.fused_attention import (
    _diag_reduce,
    fused_flash_attention_bias,
)


def _dense_bias_oracle(q, k, v, table, n_head, nk, causal):
    """Dense attention with relative-position bias on the folded layout.

    Bias semantics per reference ``commons/transformers/layers.py:13-35``:
    logits[q_pos, k_pos] += table[q_pos - k_pos + nk, h].
    """
    b, t, qc = q.shape
    hd = qc // n_head
    qh = q.reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
    if k.shape[-1] == hd:
        kh = jnp.broadcast_to(k[:, None, :, :], qh.shape)
        vh = jnp.broadcast_to(v[:, None, :, :], qh.shape)
    else:
        kh = k.reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    pos = jnp.arange(t)[:, None] - jnp.arange(t)[None, :] + nk  # (t, t)
    bias = jnp.take(table.T, pos, axis=1)  # (nh, t, t)
    s = s + bias[None]
    if causal:
        s = jnp.where(jnp.tril(jnp.ones((t, t), bool)), s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, t, qc)


def _make(b, t, n_head, hd, kvh, nk, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv_, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, t, n_head * hd), jnp.float32)
    kc = hd if kvh == 1 else n_head * hd
    k = jax.random.normal(kk, (b, t, kc), jnp.float32)
    v = jax.random.normal(kv_, (b, t, kc), jnp.float32)
    table = jax.random.normal(kb, (2 * nk + 1, n_head), jnp.float32)
    # evaluate both sides at the bf16-representable point the kernel uses
    table = table.astype(jnp.bfloat16).astype(jnp.float32)
    return q, k, v, table


def test_diag_reduce_matches_numpy():
    """The per-row binary-roll diagonal reduction vs a numpy loop."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols, w = 32, 32, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, cols), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = _diag_reduce(x_ref[...], rows, w)

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, w), jnp.float32),
        interpret=True,
    )(x)
    want = np.zeros(w)
    xn = np.asarray(x)
    for i in range(rows):
        for j in range(cols):
            want[j - i + rows - 1] += xn[i, j]
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kvh", [1, 4])
def test_bias_forward_matches_dense(causal, kvh):
    b, t, n_head, hd, nk = 2, 96, 4, 16, 96
    q, k, v, table = _make(b, t, n_head, hd, kvh, nk)
    got = fused_flash_attention_bias(q, k, v, table, n_head, nk, causal, 32, True)
    want = _dense_bias_oracle(q, k, v, table, n_head, nk, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_bias_forward_multitile_unaligned():
    """T spanning several tiles and not a multiple of the tile."""
    b, t, n_head, hd, nk = 1, 200, 2, 16, 200
    q, k, v, table = _make(b, t, n_head, hd, 1, nk, seed=3)
    got = fused_flash_attention_bias(q, k, v, table, n_head, nk, True, 64, True)
    want = _dense_bias_oracle(q, k, v, table, n_head, nk, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kvh", [1, 4])
def test_bias_grads_match_dense(causal, kvh):
    """dq/dk/dv AND the table gradient vs autodiff through the oracle.

    The oracle differentiates wrt the bf16-rounded table leaf, which is the
    same function of the table the kernel computes (rounding is elementwise
    and its JVP at the rounded point is identity for our purposes)."""
    b, t, n_head, hd, nk = 2, 70, 4, 16, 70
    q, k, v, table = _make(b, t, n_head, hd, kvh, nk, seed=7)
    cot = jax.random.normal(jax.random.PRNGKey(11), q.shape, jnp.float32)

    def loss_fused(q, k, v, table):
        return jnp.sum(
            fused_flash_attention_bias(q, k, v, table, n_head, nk, causal, 32, True) * cot
        )

    def loss_dense(q, k, v, table):
        return jnp.sum(_dense_bias_oracle(q, k, v, table, n_head, nk, causal) * cot)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, table)
    want = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, table)
    for g, w, name in zip(got, want, ["q", "k", "v", "table"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("causal", [True, False])
def test_bias_grads_multitile(causal):
    """Several diagonal classes (nt=4) incl. row padding: exercises the
    class-indexed bias DMA, the dead-chunk clamping, and cross-class dbias
    accumulation."""
    b, t, n_head, hd, nk = 1, 230, 2, 16, 230
    q, k, v, table = _make(b, t, n_head, hd, 1, nk, seed=21)
    cot = jax.random.normal(jax.random.PRNGKey(22), q.shape, jnp.float32)

    def loss_fused(q, k, v, table):
        return jnp.sum(
            fused_flash_attention_bias(q, k, v, table, n_head, nk, causal, 64, True) * cot
        )

    def loss_dense(q, k, v, table):
        return jnp.sum(_dense_bias_oracle(q, k, v, table, n_head, nk, causal) * cot)

    got_o = fused_flash_attention_bias(q, k, v, table, n_head, nk, causal, 64, True)
    want_o = _dense_bias_oracle(q, k, v, table, n_head, nk, causal)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), rtol=2e-4, atol=2e-4)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, table)
    want = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, table)
    for g, w, name in zip(got, want, ["q", "k", "v", "table"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_bias_prod_shaped_window():
    """Prod-shaped semantics at reduced scale: T == window == nk (the LTHM
    seq-512+CLS case uses nq == nk == 513 == T, reference lthm.yaml:51)."""
    b, t, n_head, hd = 1, 65, 2, 8
    nk = t
    q, k, v, table = _make(b, t, n_head, hd, 1, nk, seed=31)

    def loss_fused(q, k, v, table):
        return jnp.mean(
            fused_flash_attention_bias(q, k, v, table, n_head, nk, True, 32, True) ** 2
        )

    def loss_dense(q, k, v, table):
        return jnp.mean(_dense_bias_oracle(q, k, v, table, n_head, nk, True) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, table)
    want = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, table)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=3e-4, atol=3e-4)
