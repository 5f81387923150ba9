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
