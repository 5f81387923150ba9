"""Sequence-parallel (ring attention) TransformerStack parity.

The config knob ``TransformerConfig.sequence_parallel`` shards the sequence
dim over the mesh 'model' axis and swaps attention for the ring schedule
(``parallel/ring_attention``).  Same params, same inputs → same outputs and
gradients as the dense single-device stack, including a sequence length NOT
divisible by the ring size (padded ring path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendations_tpu.core.mesh import MeshConfig, build_mesh
from recommendations_tpu.nn.transformer import TransformerStack


def _stacks(mesh, attn_type, t):
    common = dict(
        num_layers=2,
        n_embd=16,
        n_head=2,
        attn_type=attn_type,
        is_causal=True,
        dropout=0.0,
        attn_dropout=0.0,
    )
    dense = TransformerStack(**common)
    ring = TransformerStack(use_ring=True, mesh=mesh, **common)
    return dense, ring


@pytest.mark.parametrize("attn_type", ["multi_query", "multi_head"])
@pytest.mark.parametrize("t", [8, 9])  # 9: not divisible by ring size 2
def test_seq_parallel_stack_matches_dense(attn_type, t):
    mesh = build_mesh(MeshConfig(data=-1, model=2))
    dense, ring = _stacks(mesh, attn_type, t)
    b, d = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d), jnp.float32)
    params = dense.init(jax.random.PRNGKey(1), x)

    want = dense.apply(params, x)
    # shard only batch on input: the stack's own sharding constraint moves T
    # onto the model axis (GSPMD handles T=9 with internal padding; the ring
    # itself sees the explicitly padded T from ring_attention_padded)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    got = jax.jit(lambda p, a: ring.apply(p, a))(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    # grad parity through both params and input
    cot = jax.random.normal(jax.random.PRNGKey(2), want.shape, jnp.float32)

    def loss(stack):
        def f(p, a):
            return jnp.sum(stack.apply(p, a) * cot)
        return f

    gw_p, gw_x = jax.grad(loss(dense), argnums=(0, 1))(params, x)
    gr_p, gr_x = jax.jit(jax.grad(loss(ring), argnums=(0, 1)))(params, xs)
    np.testing.assert_allclose(np.asarray(gr_x), np.asarray(gw_x), rtol=5e-4, atol=5e-5)
    flat_w = jax.tree_util.tree_leaves_with_path(gw_p)
    flat_r = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gr_p)
    )
    for k, v in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_r[jax.tree_util.keystr(k)]),
            np.asarray(v),
            rtol=5e-4,
            atol=5e-5,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(k)}",
        )


@pytest.mark.parametrize("t", [8, 9])  # 9: ring padding overhangs the table
def test_seq_parallel_stack_with_pos_bias_matches_dense(t):
    """sequence_parallel + relative-position bias runs the RING (no XLA
    fallback, VERDICT r3 #3): same params → same outputs and grads as the
    dense pos-bias stack, INCLUDING the bias-table gradient."""
    mesh = build_mesh(MeshConfig(data=-1, model=2))
    common = dict(
        num_layers=2, n_embd=16, n_head=2, attn_type="multi_query",
        is_causal=True, dropout=0.0, attn_dropout=0.0, pos_bias_window=t,
    )
    dense = TransformerStack(**common)
    ring = TransformerStack(use_ring=True, mesh=mesh, **common)
    b, d = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d), jnp.float32)
    params = dense.init(jax.random.PRNGKey(1), x)
    # the table inits to zeros (a no-op bias) — randomize it so parity
    # actually exercises the bias path
    key = jax.random.PRNGKey(3)

    def randomize(path, leaf):
        if any("pos_bias" in str(getattr(k, "key", k)) for k in path):
            return 0.5 * jax.random.normal(
                jax.random.fold_in(key, abs(hash(jax.tree_util.keystr(path))) % 2**31),
                leaf.shape, leaf.dtype,
            )
        return leaf

    params = jax.tree_util.tree_map_with_path(randomize, params)

    want = dense.apply(params, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    got = jax.jit(lambda p, a: ring.apply(p, a))(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    cot = jax.random.normal(jax.random.PRNGKey(2), want.shape, jnp.float32)

    def loss(stack):
        def f(p, a):
            return jnp.sum(stack.apply(p, a) * cot)
        return f

    gw_p, gw_x = jax.grad(loss(dense), argnums=(0, 1))(params, x)
    gr_p, gr_x = jax.jit(jax.grad(loss(ring), argnums=(0, 1)))(params, xs)
    np.testing.assert_allclose(np.asarray(gr_x), np.asarray(gw_x), rtol=5e-4, atol=5e-5)
    flat_r = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gr_p)
    )
    checked_bias = 0
    for k, v in jax.tree_util.tree_leaves_with_path(gw_p):
        ks = jax.tree_util.keystr(k)
        if "pos_bias" in ks:
            checked_bias += 1
        np.testing.assert_allclose(
            np.asarray(flat_r[ks]), np.asarray(v), rtol=5e-4, atol=5e-5,
            err_msg=f"param grad mismatch at {ks}",
        )
    assert checked_bias == 2  # one table per layer actually compared


def test_seq_parallel_noop_on_single_device_axis():
    """model axis of size 1 → falls back to the dense path (no shard_map)."""
    mesh = build_mesh(MeshConfig(data=-1, model=1))
    dense, ring = _stacks(mesh, "multi_query", 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 16), jnp.float32)
    params = dense.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(ring.apply(params, x)),
        np.asarray(dense.apply(params, x)),
        rtol=1e-6,
    )
