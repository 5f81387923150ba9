"""Ring attention: context-parallel causal attention over a mesh axis.

The long-context scale-out path (SURVEY.md §5 'long-context / sequence
parallelism' — a capability the reference lacks entirely; its tools are
memory tricks at fixed 512 context).  The sequence dimension is sharded over
a mesh axis; each device holds one Q/K/V block, and K/V blocks rotate around
the ring via ``lax.ppermute`` while every device accumulates its Q block's
attention with the numerically-stable online-softmax recurrence.  Peak
memory per device is O(T/n · T/n) logits and communication per layer is the
K/V block size × (n-1) hops riding ICI neighbor links.

jnp-level implementation (no Pallas): composes with shard_map + jit on any
backend, including restricted runtimes without gridded-pallas support.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = jnp.float32(-1e30)


def _block_attn(q, k, v, q_pos, k_pos, causal):
    """One Q-block × K-block partial attention (f32).

    Returns (m, l, o): rowwise max, sum-exp, and weighted values for the
    online-softmax merge.
    """
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / jnp.float32(math.sqrt(d))
    if causal:
        mask = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
        s = jnp.where(mask, s, _NEG)
    m = jnp.max(s, axis=-1)  # (b,h,q)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32)
    return m, l, o


def _merge(m1, l1, o1, m2, l2, o2):
    """Merge two online-softmax partials."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    l = a1 * l1 + a2 * l2
    o = a1[..., None] * o1 + a2[..., None] * o2
    return m, l, o


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    data_axis: str = "data",
    causal: bool = True,
) -> jnp.ndarray:
    """Context-parallel attention.

    q/k/v: (B, H, T, D) global, with T sharded over ``axis_name`` and B over
    ``data_axis``.  KV heads must equal Q heads (broadcast MQA upstream).
    Returns (B, H, T, D) with the same sharding.
    """
    n = mesh.shape[axis_name]
    t_global = q.shape[2]
    assert t_global % n == 0, f"seq {t_global} not divisible by ring size {n}"
    t_local = t_global // n

    def local_fn(q_blk, k_blk, v_blk):
        my = jax.lax.axis_index(axis_name)
        q32 = q_blk.astype(jnp.float32)
        base = jnp.arange(t_local, dtype=jnp.int32)
        q_pos = my.astype(jnp.int32) * t_local + base

        perm = [(i, (i + 1) % n) for i in range(n)]

        m = l = o = None
        kv = (k_blk.astype(jnp.float32), v_blk.astype(jnp.float32))
        # the block arriving at hop s originated at ring position (my - s)
        for s in range(n):
            src = jnp.mod(my.astype(jnp.int32) - s, n)
            k_pos = src * t_local + base
            ms, ls, os_ = _block_attn(q32, kv[0], kv[1], q_pos, k_pos, causal)
            if m is None:
                m, l, o = ms, ls, os_
            else:
                m, l, o = _merge(m, l, o, ms, ls, os_)
            if s != n - 1:
                kv = (
                    jax.lax.ppermute(kv[0], axis_name, perm),
                    jax.lax.ppermute(kv[1], axis_name, perm),
                )
        out = o / jnp.maximum(l, jnp.float32(1e-30))[..., None]
        return out.astype(q_blk.dtype)

    spec = P(data_axis, None, axis_name, None)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
