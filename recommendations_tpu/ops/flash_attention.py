"""Blockwise (flash-style) causal attention as a Pallas TPU kernel.

Why: XLA materializes the (B, H, T, T) logits tensor in HBM for the naive
attention formulation — at the reference scale point (B=64, H=32, T=513,
``hydra-configs/model/lthm.yaml``) that is ~2.2 GB of HBM traffic per layer
per direction.  This kernel keeps K/V rows in VMEM and runs the online-
softmax recurrence over K tiles, so HBM sees only Q/K/V/O.

Scope: the LTHM long-context path (BASELINE config 5, seq 1024+).  No
relative-position-bias support — the module falls back to the XLA path when
``pos_bias`` is configured.  MQA (1 KV head) and MHA both supported via the
KV head index map.

Shapes: q (B, H, T, D), k/v (B, KVH, T, D) with KVH ∈ {1, H}.  D is padded
to the 128-lane minimum internally.  Accumulation in float32.

Runtime note: some restricted TPU runtimes (e.g. remote-compile tunnels)
cannot lower *gridded* pallas_call at all; the kernel is then unavailable and
``use_flash_attention`` must stay off (the XLA path is the default).  The
kernel is exact-tested against a dense reference in interpret mode.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, tile_q, seq_len, causal, scale):
    """Per-q-tile attention against the full K/V rows resident in VMEM.

    The (TQ, T) logits tile lives only in VMEM — HBM never sees a T x T
    tensor (the XLA path materializes (B, H, T, T) in HBM).  Straight-line
    code (no loop carries) keeps Mosaic's lowering happy; every scalar is
    pinned f32/i32 because x64 weak promotion would create f64/i64 ops that
    Mosaic cannot legalize.
    """
    iq = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * jnp.float32(scale)  # (TQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (T_pad, D)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, T_pad)
    t_pad = s.shape[1]
    q_pos = iq * jnp.int32(tile_q) + jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, t_pad), 0
    )
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (tile_q, t_pad), 1)
    mask = k_pos < jnp.int32(seq_len)
    if causal:
        mask = mask & (k_pos <= q_pos)
    s = jnp.where(mask, s, jnp.float32(NEG_INF))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / jnp.maximum(l, jnp.float32(1e-30))).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = True,
    tile_q: int = 128,
    tile_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """O(T) memory attention.  q: (B,H,T,D); k/v: (B,KVH,T,D), KVH ∈ {1,H}."""
    b, h, t, d = q.shape
    kvh = k.shape[1]
    assert kvh in (1, h), f"kv heads {kvh} incompatible with {h}"
    scale = 1.0 / math.sqrt(d)

    # pad D to the 128-lane minimum and T to the tile size
    d_pad = max(128, ((d + 127) // 128) * 128)
    tile_q = min(tile_q, max(128, t))
    t_pad = ((t + max(tile_q, tile_k) - 1) // max(tile_q, tile_k)) * max(tile_q, tile_k)
    if d_pad != d or t_pad != t:
        pad_qs = [(0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)]
        q = jnp.pad(q, pad_qs)
        k = jnp.pad(k, pad_qs)
        v = jnp.pad(v, pad_qs)

    grid = (b, h, t_pad // tile_q)
    kv_index = (lambda ib, ih, iq: (ib, 0, 0, 0)) if kvh == 1 else (
        lambda ib, ih, iq: (ib, ih, 0, 0)
    )

    kernel = functools.partial(
        _attn_kernel,
        tile_q=tile_q,
        seq_len=t,
        causal=causal,
        scale=scale,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_q, d_pad),
                lambda ib, ih, iq: (ib, ih, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, t_pad, d_pad), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d_pad), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_q, d_pad),
            lambda ib, ih, iq: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                1.5 * (2 * t_pad * d_pad * 4 + 2 * tile_q * t_pad * 4 + 2 * tile_q * d_pad * 4)
            )
            + (1 << 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * t * t * d * (1 if causal else 2) // (2 if causal else 1),
            bytes_accessed=(2 * t * d * 2 + 2 * t * d * 2),
            transcendentals=t * t,
        ),
        interpret=interpret,
    )(q, k, v)
    if d_pad != d or t_pad != t:
        out = out[:, :, :t, :d]
    return out
