"""Ring attention vs dense reference on a virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendations_tpu.core.mesh import MeshConfig, build_mesh
from recommendations_tpu.parallel.ring_attention import ring_attention


def _dense(q, k, v, causal):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    if causal:
        t = q.shape[2]
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("ring", [2, 4])
def test_ring_matches_dense(causal, ring):
    mesh = build_mesh(MeshConfig(data=-1, model=ring))
    b, h, t, d = 8 // ring, 2, 32, 16  # batch divisible by the data axis
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, d), jnp.float32)
    spec = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    got = jax.jit(
        lambda a, b_, c: ring_attention(a, b_, c, mesh, causal=causal)
    )(qs, ks, vs)
    want = _dense(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def _dense_bias(q, k, v, tab, nk, causal):
    """XLA oracle: dense attention + relative-position bias table[q-k+nk]."""
    d = q.shape[-1]
    t = q.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    idx = jnp.arange(t)[:, None] - jnp.arange(t)[None, :] + nk
    s = s + jnp.transpose(jnp.take(tab, idx, axis=0), (2, 0, 1))[None]
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("ring", [2, 4])
def test_ring_bias_matches_dense(ring):
    """Forward + FULL grad parity (q, k, v AND the bias table) vs the XLA
    pos-bias oracle on a virtual mesh (VERDICT r3 #3: rung-5 scale-out of
    the prod-shaped model)."""
    mesh = build_mesh(MeshConfig(data=-1, model=ring))
    b, h, t, d = 8 // ring, 2, 32, 16
    nk = t  # reference layout: table rows q-k+nk, L = 2t+1
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, d), jnp.float32)
    tab = 0.5 * jax.random.normal(jax.random.fold_in(key, 3), (2 * t + 1, h), jnp.float32)
    spec = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))

    got = jax.jit(
        lambda a, b_, c, tb: ring_attention(
            a, b_, c, mesh, causal=True, bias_table=tb, nk=nk
        )
    )(qs, ks, vs, tab)
    want = _dense_bias(q, k, v, tab, nk, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    # grad parity, including d(table) (reduced across ring AND data axes)
    co = jax.random.normal(jax.random.fold_in(key, 4), got.shape, jnp.float32)

    def loss_ring(a, b_, c, tb):
        out = ring_attention(a, b_, c, mesh, causal=True, bias_table=tb, nk=nk)
        return jnp.sum(out * co)

    def loss_dense(a, b_, c, tb):
        return jnp.sum(_dense_bias(a, b_, c, tb, nk, causal=True) * co)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3)))(qs, ks, vs, tab)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, tab)
    for gr, gd, name in zip(g_ring, g_dense, ("dq", "dk", "dv", "dtable")):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gd), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_ring_bias_mqa_padded():
    """MQA (1 KV head) + a seq length NOT divisible by the ring: the padded
    path must keep bias fwd/bwd parity (pad rows contribute nothing)."""
    from recommendations_tpu.parallel.ring_attention import ring_attention_padded

    mesh = build_mesh(MeshConfig(data=-1, model=4))
    b, h, t, d = 2, 4, 27, 8
    nk = 32
    key = jax.random.PRNGKey(11)
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, 1, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, 1, t, d), jnp.float32)
    tab = 0.3 * jax.random.normal(jax.random.fold_in(key, 3), (2 * nk + 1, h), jnp.float32)

    def dense(a, b_, c, tb):
        s = jnp.einsum("bhqd,bkd->bhqk", a, b_[:, 0]) / np.sqrt(d)
        idx = jnp.arange(t)[:, None] - jnp.arange(t)[None, :] + nk
        s = s + jnp.transpose(jnp.take(tb, idx, axis=0), (2, 0, 1))[None]
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask, s, -1e30)
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkd->bhqd", w, c[:, 0])

    got = jax.jit(
        lambda a, b_, c, tb: ring_attention_padded(
            a, b_, c, mesh, causal=True, bias_table=tb, nk=nk
        )
    )(q, k, v, tab)
    want = dense(q, k, v, tab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    co = jax.random.normal(jax.random.fold_in(key, 5), got.shape, jnp.float32)
    g_ring = jax.jit(jax.grad(
        lambda a, b_, c, tb: jnp.sum(
            ring_attention_padded(a, b_, c, mesh, causal=True, bias_table=tb, nk=nk) * co
        ),
        argnums=(0, 1, 2, 3),
    ))(q, k, v, tab)
    g_dense = jax.grad(
        lambda a, b_, c, tb: jnp.sum(dense(a, b_, c, tb) * co), argnums=(0, 1, 2, 3)
    )(q, k, v, tab)
    for gr, gd, name in zip(g_ring, g_dense, ("dq", "dk", "dv", "dtable")):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gd), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_ring_grad_flows():
    mesh = build_mesh(MeshConfig(data=-1, model=2))
    b, h, t, d = 4, 1, 8, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, t, d), jnp.float32)

    def loss(q):
        out = ring_attention(q, q, q, mesh, causal=True)
        return jnp.sum(out**2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
