"""Row gather with a two-level (bucketed) scatter-add backward.

XLA:TPU lowers ``zeros.at[idx].add(rows)`` into a serialized scatter whose
cost is roughly flat in the destination size and ~19-25ms for the LTHM-base
backward (135K rows into a 1M-row table) — measured on v5e; sortedness /
uniqueness flags change nothing. But the same scatter into a VMEM-sized
destination (<= 64K rows x 32) runs ~7x faster: XLA keeps the accumulator
on-chip.

``gather_rows`` exploits this: the forward is a plain ``jnp.take``; the
backward sorts the (index, grad-row) pairs once, slices a fixed-capacity
window per 64K-row bucket (hashed ids are near-uniform, so 2x the mean
count is > 20 sigma of headroom), and scatter-adds each window into its
bucket slice on-chip. Out-of-bucket entries in a window are dropped via an
out-of-range index (``mode="drop"``). A sentinel pad prevents the last
window from clamping into the previous bucket (double-count hazard).

Skew safety: with adversarial/duplicate-heavy ids a bucket can exceed its
window capacity; the row counts are checked in-graph and ``lax.cond`` falls
back to the plain serialized scatter — bit-correct in all cases, fast in
the hashed-id common case.

Replaces the backward of the reference's ``nn.Embedding`` gathers
(``commons/layers.py:125-185`` KShiftEmbedding) on the TPU hot path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

# bucket slice = 64K rows: at 32-128 f32 features the accumulator slice
# stays in the few-MB range XLA keeps on-chip
BUCKET_ROWS = 65536


def plain_scatter_add(
    idx_flat: jnp.ndarray, rows_flat: jnp.ndarray, num_rows: int
) -> jnp.ndarray:
    return jnp.zeros((num_rows, rows_flat.shape[-1]), rows_flat.dtype).at[
        idx_flat
    ].add(rows_flat)


def bucketed_scatter_add(
    idx_flat: jnp.ndarray,
    rows_flat: jnp.ndarray,
    num_rows: int,
    bucket_rows: int = BUCKET_ROWS,
) -> jnp.ndarray:
    """sum_n onehot(idx[n]) * rows[n] over a (num_rows, D) destination."""
    n = idx_flat.shape[0]
    nb = -(-num_rows // bucket_rows)
    cap = min(n, -(-2 * n // nb))
    # round capacity up to the f32 sublane tile so windows stay aligned
    cap = -(-cap // 8) * 8
    if nb <= 1 or cap >= n:
        return plain_scatter_add(idx_flat, rows_flat, num_rows)

    d = rows_flat.shape[-1]
    idx32 = idx_flat.astype(jnp.int32)
    si, order = jax.lax.sort_key_val(idx32, jnp.arange(n, dtype=jnp.int32))
    sr = jnp.take(rows_flat, order, axis=0)
    # sentinel pad: windows slicing past the end read num_rows (out of every
    # bucket's range -> dropped) instead of clamping into earlier entries
    si = jnp.concatenate([si, jnp.full((cap,), num_rows, jnp.int32)])
    sr = jnp.concatenate([sr, jnp.zeros((cap, d), sr.dtype)])

    edges = jnp.arange(nb + 1, dtype=jnp.int32) * jnp.int32(bucket_rows)
    starts = jnp.searchsorted(si[:n], edges).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]
    fits = jnp.all(counts <= jnp.int32(cap))

    def fast(_):
        subs = []
        for b in range(nb):
            wi = jax.lax.dynamic_slice_in_dim(si, starts[b], cap)
            wr = jax.lax.dynamic_slice_in_dim(sr, starts[b], cap)
            local = wi - jnp.int32(b * bucket_rows)
            local = jnp.where(
                (wi >= b * bucket_rows) & (wi < (b + 1) * bucket_rows),
                local,
                jnp.int32(bucket_rows),
            )
            subs.append(
                jnp.zeros((bucket_rows, d), rows_flat.dtype)
                .at[local]
                .add(wr, mode="drop", indices_are_sorted=True)
            )
        return jnp.concatenate(subs, axis=0)[:num_rows]

    def slow(_):
        return plain_scatter_add(si[:n], sr[:n], num_rows)

    return jax.lax.cond(fits, fast, slow, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(
    table: jnp.ndarray, idx: jnp.ndarray, bucket_rows: int = BUCKET_ROWS
) -> jnp.ndarray:
    """``table[idx]`` whose backward is a bucketed scatter-add.

    table: (V, D); idx: any integer shape; returns idx.shape + (D,).
    """
    return jnp.take(table, idx.astype(jnp.int32), axis=0)


def _gather_fwd(table, idx, bucket_rows):
    return gather_rows(table, idx, bucket_rows), (idx, table.shape[0])


def _gather_bwd(bucket_rows, res, g):
    idx, num_rows = res
    d = g.shape[-1]
    dtable = bucketed_scatter_add(
        idx.reshape(-1).astype(jnp.int32),
        g.reshape(-1, d),
        num_rows,
        bucket_rows,
    )
    return dtable, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
