"""Ring attention: context-parallel causal attention over a mesh axis.

The long-context scale-out path (SURVEY.md §5 'long-context / sequence
parallelism' — a capability the reference lacks entirely; its tools are
memory tricks at fixed 512 context).  The sequence dimension is sharded over
a mesh axis; each device holds one Q/K/V block, and K/V blocks rotate around
the ring via ``lax.ppermute`` while every device accumulates its Q block's
attention with the numerically-stable online-softmax recurrence.  Peak
memory per device is O(T/n · T/n) logits and communication per layer is the
K/V block size × (n-1) hops riding ICI neighbor links.

Backward (custom VJP, memory-sane): the forward saves only (q, k, v, out,
logsumexp) local blocks — O(T/n) — and the backward re-runs the ring,
recomputing each hop's probabilities from the saved logsumexp while the
dK/dV accumulators travel WITH their K/V blocks around the ring (one extra
hop at the end returns them to their owners).  Per-hop memory stays
O(T/n · T/n); nothing is materialized across hops (round-1's version
autodiffed through the python hop loop, stacking n hops of K/V residuals).

jnp-level implementation (no Pallas): composes with shard_map + jit on any
backend, including restricted runtimes without gridded-pallas support.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = jnp.float32(-1e30)


def _bias_idx(q_pos, k_pos, nk: int, l_table: int):
    """(q, k) table rows for the relative-position bias: q_pos - k_pos + nk,
    clipped (out-of-range rows only occur at ring-padding positions, whose
    outputs are sliced off / causally masked)."""
    idx = q_pos[:, None] - k_pos[None, :] + jnp.int32(nk)
    return jnp.clip(idx, 0, l_table - 1)


def _scores(q, k, q_pos, k_pos, causal, bias_tab=None, nk: int = 0):
    """(b,h,q,k) logits in f32 with causal/global-position masking.

    ``k`` may have 1 KV head (MQA) — broadcast in the einsum, never
    materialized.  ``bias_tab`` (L, nh): learned relative-position bias
    added per global q-k offset (reference
    ``commons/transformers/layers.py:13-35``) — each ring hop knows its
    block's global positions, so the Toeplitz block is gathered per hop.
    """
    d = q.shape[-1]
    if k.shape[1] == 1 and q.shape[1] != 1:
        s = jnp.einsum("bhqd,bkd->bhqk", q, k[:, 0], preferred_element_type=jnp.float32)
    else:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / jnp.float32(math.sqrt(d))
    if bias_tab is not None:
        idx = _bias_idx(q_pos, k_pos, nk, bias_tab.shape[0])
        # gather from the (nh, L) transpose: born in the (nh, q, k) layout
        s = s + jnp.take(bias_tab.T, idx, axis=1)[None]
    if causal:
        mask = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
        s = jnp.where(mask, s, _NEG)
    return s


def _pv(p, v):
    if v.shape[1] == 1 and p.shape[1] != 1:
        return jnp.einsum("bhqk,bkd->bhqd", p, v[:, 0], preferred_element_type=jnp.float32)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32)


def _ring_fwd_loop(q, k, v, axis_name: str, n: int, causal: bool,
                   bias_tab=None, nk: int = 0):
    """Online-softmax ring forward on LOCAL blocks.  Returns (out, lse)."""
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    t_local = q.shape[2]
    base = jnp.arange(t_local, dtype=jnp.int32)
    q_pos = my * t_local + base
    perm = [(i, (i + 1) % n) for i in range(n)]

    q32 = q.astype(jnp.float32)
    kv = (k.astype(jnp.float32), v.astype(jnp.float32))
    m = l = o = None
    for s in range(n):
        src = jnp.mod(my - s, n)
        k_pos = src * t_local + base
        z = _scores(q32, kv[0], q_pos, k_pos, causal, bias_tab, nk)
        ms = jnp.max(z, axis=-1)
        ps = jnp.exp(z - ms[..., None])
        ls = jnp.sum(ps, axis=-1)
        os_ = _pv(ps, kv[1])
        if m is None:
            m, l, o = ms, ls, os_
        else:
            m_new = jnp.maximum(m, ms)
            a1 = jnp.exp(m - m_new)
            a2 = jnp.exp(ms - m_new)
            l = a1 * l + a2 * ls
            o = a1[..., None] * o + a2[..., None] * os_
            m = m_new
        if s != n - 1:
            kv = (
                jax.lax.ppermute(kv[0], axis_name, perm),
                jax.lax.ppermute(kv[1], axis_name, perm),
            )
    l_safe = jnp.maximum(l, jnp.float32(1e-30))
    out = o / l_safe[..., None]
    lse = m + jnp.log(l_safe)  # (b, h, t_local)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ring_attn_local(q, k, v, axis_name: str, n: int, causal: bool):
    out, _ = _ring_fwd_loop(q, k, v, axis_name, n, causal)
    return out.astype(q.dtype)


def _ring_vjp_fwd(q, k, v, axis_name, n, causal):
    out, lse = _ring_fwd_loop(q, k, v, axis_name, n, causal)
    return out.astype(q.dtype), (q, k, v, out, lse)


def _ring_vjp_bwd(axis_name, n, causal, res, g):
    q, k, v, out, lse = res
    d = q.shape[-1]
    scale = jnp.float32(1.0 / math.sqrt(d))
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    t_local = q.shape[2]
    base = jnp.arange(t_local, dtype=jnp.int32)
    q_pos = my * t_local + base
    perm = [(i, (i + 1) % n) for i in range(n)]
    kvh = k.shape[1]

    q32 = q.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    delta = jnp.sum(g32 * out, axis=-1)  # (b,h,q)

    dq = jnp.zeros_like(q32)
    state = (
        k.astype(jnp.float32),
        v.astype(jnp.float32),
        jnp.zeros(k.shape, jnp.float32),
        jnp.zeros(v.shape, jnp.float32),
    )
    for s in range(n):
        k_s, v_s, dk_s, dv_s = state
        src = jnp.mod(my - s, n)
        k_pos = src * t_local + base
        z = _scores(q32, k_s, q_pos, k_pos, causal)
        p = jnp.exp(z - lse[..., None])  # masked entries: exp(-inf) = 0
        # dp_ij = g_i . v_j  → same contraction pattern as scores
        if v_s.shape[1] == 1 and q32.shape[1] != 1:
            dp = jnp.einsum("bhqd,bkd->bhqk", g32, v_s[:, 0], preferred_element_type=jnp.float32)
        else:
            dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v_s, preferred_element_type=jnp.float32)
        ds = p * (dp - delta[..., None])  # (b,h,q,k)
        if kvh == 1:
            dq = dq + jnp.einsum("bhqk,bkd->bhqd", ds, k_s[:, 0], preferred_element_type=jnp.float32) * scale
            dk_s = dk_s + jnp.einsum("bhqk,bhqd->bkd", ds, q32, preferred_element_type=jnp.float32)[:, None] * scale
            dv_s = dv_s + jnp.einsum("bhqk,bhqd->bkd", p, g32, preferred_element_type=jnp.float32)[:, None]
        else:
            dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, k_s, preferred_element_type=jnp.float32) * scale
            dk_s = dk_s + jnp.einsum("bhqk,bhqd->bhkd", ds, q32, preferred_element_type=jnp.float32) * scale
            dv_s = dv_s + jnp.einsum("bhqk,bhqd->bhkd", p, g32, preferred_element_type=jnp.float32)
        state = (k_s, v_s, dk_s, dv_s)
        # rotate every hop; the final rotation returns accumulators to the
        # block's owner (block o sits at device o-1 after hop n-1)
        state = tuple(jax.lax.ppermute(x, axis_name, perm) for x in state)
    _, _, dk, dv = state
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_attn_local.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


# ---------------------------------------------------------------------------
# Relative-position-bias variant (VERDICT r3 #3: rung-5 scale-out for the
# prod-shaped model).  The (L, nh) table is tiny and position-indexed; each
# hop gathers its Toeplitz block from global q/k positions and adds it
# before the online-softmax update.  d(table) is the diagonal-indexed
# scatter-add of ds per hop, accumulated locally; shard_map's transpose of
# the replicated (P()) table input sums the per-device partials over BOTH
# mesh axes (ring blocks and batch shards), which is exactly the global
# table gradient — verified against the XLA pos-bias oracle in
# tests/test_ring_attention.py.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _ring_attn_local_bias(q, k, v, tab, axis_name: str, n: int, causal: bool,
                          nk: int):
    out, _ = _ring_fwd_loop(q, k, v, axis_name, n, causal, tab, nk)
    return out.astype(q.dtype)


def _ring_bias_vjp_fwd(q, k, v, tab, axis_name, n, causal, nk):
    out, lse = _ring_fwd_loop(q, k, v, axis_name, n, causal, tab, nk)
    return out.astype(q.dtype), (q, k, v, tab, out, lse)


def _ring_bias_vjp_bwd(axis_name, n, causal, nk, res, g):
    q, k, v, tab, out, lse = res
    d = q.shape[-1]
    l_table = tab.shape[0]
    scale = jnp.float32(1.0 / math.sqrt(d))
    my = jax.lax.axis_index(axis_name).astype(jnp.int32)
    t_local = q.shape[2]
    base = jnp.arange(t_local, dtype=jnp.int32)
    q_pos = my * t_local + base
    perm = [(i, (i + 1) % n) for i in range(n)]
    kvh = k.shape[1]

    q32 = q.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    tab32 = tab.astype(jnp.float32)
    delta = jnp.sum(g32 * out, axis=-1)  # (b,h,q)

    dq = jnp.zeros_like(q32)
    dtab = jnp.zeros((l_table, tab.shape[1]), jnp.float32)
    state = (
        k.astype(jnp.float32),
        v.astype(jnp.float32),
        jnp.zeros(k.shape, jnp.float32),
        jnp.zeros(v.shape, jnp.float32),
    )
    for s in range(n):
        k_s, v_s, dk_s, dv_s = state
        src = jnp.mod(my - s, n)
        k_pos = src * t_local + base
        z = _scores(q32, k_s, q_pos, k_pos, causal, tab32, nk)
        p = jnp.exp(z - lse[..., None])  # masked entries: exp(-inf) = 0
        if v_s.shape[1] == 1 and q32.shape[1] != 1:
            dp = jnp.einsum("bhqd,bkd->bhqk", g32, v_s[:, 0], preferred_element_type=jnp.float32)
        else:
            dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v_s, preferred_element_type=jnp.float32)
        ds = p * (dp - delta[..., None])  # (b,h,q,k)
        # d(table): ds summed over batch, scatter-added at this hop's
        # diagonal rows (the bias enters the logits additively, unscaled)
        idx = _bias_idx(q_pos, k_pos, nk, l_table)  # (q, k)
        ds_hqk = jnp.sum(ds, axis=0)  # (h, q, k)
        dtab = dtab.at[idx.reshape(-1)].add(
            jnp.transpose(ds_hqk, (1, 2, 0)).reshape(-1, tab.shape[1])
        )
        if kvh == 1:
            dq = dq + jnp.einsum("bhqk,bkd->bhqd", ds, k_s[:, 0], preferred_element_type=jnp.float32) * scale
            dk_s = dk_s + jnp.einsum("bhqk,bhqd->bkd", ds, q32, preferred_element_type=jnp.float32)[:, None] * scale
            dv_s = dv_s + jnp.einsum("bhqk,bhqd->bkd", p, g32, preferred_element_type=jnp.float32)[:, None]
        else:
            dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, k_s, preferred_element_type=jnp.float32) * scale
            dk_s = dk_s + jnp.einsum("bhqk,bhqd->bhkd", ds, q32, preferred_element_type=jnp.float32) * scale
            dv_s = dv_s + jnp.einsum("bhqk,bhqd->bhkd", p, g32, preferred_element_type=jnp.float32)
        state = (k_s, v_s, dk_s, dv_s)
        state = tuple(jax.lax.ppermute(x, axis_name, perm) for x in state)
    _, _, dk, dv = state
    # dtab stays a LOCAL partial: shard_map's transpose of the P()-replicated
    # table input psums it over every mesh axis (ring + data)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        dtab.astype(tab.dtype),
    )


_ring_attn_local_bias.defvjp(_ring_bias_vjp_fwd, _ring_bias_vjp_bwd)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    data_axis: str = "data",
    causal: bool = True,
    bias_table: Optional[jnp.ndarray] = None,
    nk: int = 0,
) -> jnp.ndarray:
    """Context-parallel attention.

    q: (B, H, T, D) global, with T sharded over ``axis_name`` and B over
    ``data_axis``; k/v: (B, Hk, T, D) with Hk ∈ {1, H} (MQA broadcast inside
    — never materialized).  Returns (B, H, T, D) with q's sharding.
    Differentiable with O(T/n) residuals (see module docstring).

    ``bias_table`` (L, nh): learned relative-position bias applied at logit
    (q_pos - k_pos + nk) — the reference's RelativePositionBias
    (``commons/transformers/layers.py:13-35``) riding the ring; the table is
    replicated, its gradient reduced across the mesh by shard_map.
    """
    n = mesh.shape[axis_name]
    t_global = q.shape[2]
    assert t_global % n == 0, f"seq {t_global} not divisible by ring size {n}"

    spec = P(data_axis, None, axis_name, None)
    if bias_table is None:

        def local_fn(q_blk, k_blk, v_blk):
            return _ring_attn_local(q_blk, k_blk, v_blk, axis_name, n, causal)

        return jax.shard_map(
            local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(q, k, v)

    def local_fn_bias(q_blk, k_blk, v_blk, tab):
        return _ring_attn_local_bias(
            q_blk, k_blk, v_blk, tab, axis_name, n, causal, nk
        )

    return jax.shard_map(
        local_fn_bias, mesh=mesh, in_specs=(spec, spec, spec, P()),
        out_specs=spec, check_vma=False,
    )(q, k, v, bias_table)


def ring_attention_padded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    data_axis: str = "data",
    causal: bool = True,
    bias_table: Optional[jnp.ndarray] = None,
    nk: int = 0,
) -> jnp.ndarray:
    """Ring attention for sequence lengths not divisible by the ring size.

    Pads T up to a multiple of the ring (pad tokens sit at the END of the
    sequence: under causal masking no real query can attend them) and slices
    the output back.  Requires ``causal=True`` — without causality pad keys
    would leak into real rows.  Pad-position bias rows clip into the table
    but never contribute (pad keys are causally masked; pad-query rows get
    zero cotangents, so ds — hence d(table) — vanishes there).
    """
    assert causal, "padded ring attention requires causal masking"
    n = mesh.shape[axis_name]
    t = q.shape[2]
    t_pad = ((t + n - 1) // n) * n
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = ring_attention(
        q, k, v, mesh, axis_name=axis_name, data_axis=data_axis, causal=causal,
        bias_table=bias_table, nk=nk,
    )
    return out[:, :, :t, :]
