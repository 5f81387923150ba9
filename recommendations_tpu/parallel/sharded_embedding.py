"""Row-sharded embedding tables over the 'model' mesh axis.

The flagship TPU capability (BASELINE.json north star): tables too big for
one chip's HBM are split by rows across the mesh, and lookups become
mesh-local gathers + one ICI collective.  The reference has no equivalent —
its answer to big vocabularies is hash compression only (KShift,
``commons/layers.py:125-185``); here compression and sharding compose.

Key observation for KShift: the module *sums* the k hashed rows per id, so a
row-sharded lookup needs no all-to-all at all — each shard sums the subset
of the k rows it owns (a local gather with out-of-range rows masked to
zero), and one ``psum`` over the 'model' axis yields the complete sum.  The
communication is exactly one (N, d) reduction per lookup, independent of k.

For plain (non-summed) tables the same owned-row + psum trick performs the
gather with one reduction; a ``psum_scatter`` variant keeps the activation
sharded when the consumer is sharded the same way.

Two collective schedules are provided (both ``jax.shard_map`` so the
schedule is explicit and deterministic rather than left to the SPMD
partitioner):

- ``psum``: every shard sums the rows it owns, one all-reduce of the
  (tokens, d) activation.  Comm volume ~= 2 * tokens * d * 4 bytes per
  lookup regardless of how many distinct rows the batch touches.
- ``alltoall`` (the pod-scale schedule, BASELINE.json north star): each
  device deduplicates the row indices it needs, exchanges *unique* row
  requests with the owning shards via ``lax.all_to_all``, owners gather
  locally, and a second all-to-all returns the embeddings; a final local
  take scatters them back to token positions.  Comm volume is proportional
  to the number of UNIQUE rows touched (requests ride as int32, activations
  once in the compute dtype), which is what wins at 100M-row tables where
  batches touch a sliver of the table and sessions repeat products heavily.

The all-to-all buffers are static-shape: per-destination capacity is
``capacity_factor * ceil(n_rows_requested / n_shards)`` (indices are
xxhash-uniform over shards, so overflow probability decays exponentially);
requests past capacity are dropped to zero embeddings and counted in the
``overflow`` output so callers can alarm on it.

Sizing rule: with R unique requested rows spread uniformly over P shards,
per-shard load is ~Binomial(R, 1/P); capacity_factor=2.0 keeps the
overflow probability under ~exp(-R/(3P)) (Chernoff), i.e. negligible once
R/P > 50.  ``ShardedKShiftEmbedding`` sows the global overflow count into
the 'intermediates' collection as ``alltoall_overflow`` and the LTHM
train step reports it as the ``embedding_alltoall_overflow`` metric —
alarm on any sustained nonzero value and raise capacity_factor.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from recommendations_tpu.nn.embeddings import kshift_row_indices
from recommendations_tpu.nn.functional import l2_normalize


def _owned_rows_sum(
    table_shard: jnp.ndarray,
    global_idx: jnp.ndarray,
    shard_id: jnp.ndarray,
    rows_per_shard: int,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Sum of owned rows per id: (..., k) global rows → (..., d) partial sum.

    ``compute_dtype=bf16`` halves the gathered-row bytes and the backward
    scatter-add bytes (both row-transfer-bound); the partial sum is returned
    in f32 so the cross-shard psum accumulates exactly.
    """
    if compute_dtype is not None:
        table_shard = table_shard.astype(compute_dtype)
    local = global_idx - shard_id * rows_per_shard
    owned = (local >= 0) & (local < rows_per_shard)
    safe = jnp.where(owned, local, 0).astype(jnp.int32)
    flat = safe.reshape(-1)
    rows = jnp.take(table_shard, flat, axis=0).reshape(*safe.shape, -1)
    zero = jnp.zeros((), table_shard.dtype)
    return jnp.sum(jnp.where(owned[..., None], rows, zero), axis=-2).astype(jnp.float32)


def sharded_kshift_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    num_shifts: int,
    *,
    axis_name: str = "model",
    data_axis: str = "data",
    normalize_output: bool = False,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """KShift lookup with the table row-sharded over ``axis_name``.

    ``table``: (P, d) global logical shape (sharded P(axis_name, None)).
    ``ids``: (...,) int64, sharded over ``data_axis`` on the leading dim.
    Returns (..., d) with the same data sharding, replicated over the model
    axis.
    """
    num_embeddings = table.shape[0]
    n_shards = mesh.shape[axis_name]
    assert num_embeddings % n_shards == 0, (
        f"table rows {num_embeddings} not divisible by {n_shards} shards"
    )
    rows_per_shard = num_embeddings // n_shards

    def local_fn(table_shard, ids_local):
        shard_id = jax.lax.axis_index(axis_name)
        idx = kshift_row_indices(ids_local, num_embeddings, num_shifts)
        partial_sum = _owned_rows_sum(
            table_shard, idx, shard_id, rows_per_shard, compute_dtype
        )
        total = jax.lax.psum(partial_sum, axis_name)
        if normalize_output:
            return l2_normalize(total)
        return total / math.sqrt(num_shifts)

    extra = ids.ndim - 1
    out = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(data_axis, *([None] * extra))),
        out_specs=P(data_axis, *([None] * extra), None),
        check_vma=False,
    )(table, ids)
    return out


def sharded_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    data_axis: str = "data",
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Plain row-sharded gather: table[ids mod P] with one psum over the
    model axis (each row owned by exactly one shard)."""
    num_embeddings = table.shape[0]
    n_shards = mesh.shape[axis_name]
    assert num_embeddings % n_shards == 0
    rows_per_shard = num_embeddings // n_shards

    def local_fn(table_shard, ids_local):
        shard_id = jax.lax.axis_index(axis_name)
        idx = jnp.mod(ids_local.astype(jnp.int64), num_embeddings)[..., None]
        partial_rows = _owned_rows_sum(
            table_shard, idx, shard_id, rows_per_shard, compute_dtype
        )
        return jax.lax.psum(partial_rows, axis_name)

    extra = ids.ndim - 1
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(data_axis, *([None] * extra))),
        out_specs=P(data_axis, *([None] * extra), None),
        check_vma=False,
    )(table, ids)


# ---------------------------------------------------------------------------
# all-to-all unique-ID schedule
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def resolve_capacity(n_requests: int, n_shards: int, capacity_factor: float) -> int:
    """Static per-destination request capacity, lane-aligned."""
    base = (n_requests + n_shards - 1) // n_shards
    return _round_up(max(int(math.ceil(base * capacity_factor)), 8), 128)


def _unique_alltoall_gather(
    table_shard: jnp.ndarray,
    rows: jnp.ndarray,
    *,
    axis_name: str,
    n_shards: int,
    rows_per_shard: int,
    capacity: int,
    compute_dtype: Optional[jnp.dtype] = None,
):
    """Dedup → all-to-all → local gather → all-to-all return → local scatter.

    ``rows``: (N,) global row indices local to this device.
    Returns ((N, d) rows in f32, overflow count).  Differentiable w.r.t. the
    table (take transposes to scatter-add; all_to_all transposes to the
    reverse all_to_all), so the backward ships only unique-row gradients.
    """
    n = rows.shape[0]
    d = table_shard.shape[-1]
    idx_dtype = jnp.int32 if n_shards * rows_per_shard < 2**31 else jnp.int64
    rows = rows.astype(idx_dtype)
    if compute_dtype is not None:
        table_shard = table_shard.astype(compute_dtype)

    perm = jnp.argsort(rows)
    sorted_rows = rows[perm]
    uniq = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_rows[1:] != sorted_rows[:-1]]
    )
    rank = jnp.cumsum(uniq) - 1                       # unique rank per position
    owner = sorted_rows // rows_per_shard             # non-decreasing
    counts = jax.ops.segment_sum(
        uniq.astype(idx_dtype), owner.astype(jnp.int32), num_segments=n_shards
    )
    offsets = jnp.cumsum(counts) - counts             # exclusive prefix
    pos = (rank - offsets[owner]).astype(idx_dtype)   # slot within owner bucket
    in_cap = pos < capacity
    valid = uniq & in_cap
    overflow = jnp.sum(uniq & ~in_cap)

    # request buffer: send[s, p] = p-th unique row owned by shard s (-1 pad).
    # scatter-with-drop keeps the shape static; invalid entries aim past the
    # buffer and are dropped.
    flat_target = jnp.where(
        valid, owner * capacity + pos, jnp.asarray(n_shards * capacity, idx_dtype)
    )
    send = (
        jnp.full((n_shards * capacity,), -1, idx_dtype)
        .at[flat_target]
        .set(sorted_rows, mode="drop")
        .reshape(n_shards, capacity)
    )

    if n_shards > 1:
        recv = jax.lax.all_to_all(send, axis_name, 0, 0, tiled=True)
    else:
        recv = send
    shard_id = jax.lax.axis_index(axis_name) if n_shards > 1 else 0
    local = recv - shard_id * rows_per_shard
    ok = recv >= 0
    safe = jnp.where(ok, local, 0).astype(jnp.int32)
    gathered = jnp.take(table_shard, safe.reshape(-1), axis=0)
    gathered = gathered.reshape(n_shards, capacity, d)
    gathered = jnp.where(ok[..., None], gathered, jnp.zeros((), gathered.dtype))
    if n_shards > 1:
        back = jax.lax.all_to_all(gathered, axis_name, 0, 0, tiled=True)
    else:
        back = gathered

    # local scatter back: duplicates share the rank (hence slot) of their
    # first occurrence, so every sorted position can gather its embedding
    flat = back.reshape(n_shards * capacity, d)
    g_idx = jnp.where(in_cap, owner * capacity + pos, 0).astype(jnp.int32)
    out_sorted = jnp.take(flat, g_idx, axis=0)
    out_sorted = jnp.where(in_cap[..., None], out_sorted, jnp.zeros((), flat.dtype))
    inv = jnp.argsort(perm)
    return jnp.take(out_sorted, inv, axis=0).astype(jnp.float32), overflow


def _global_overflow(overflow, mesh: Mesh, axis_name: str, data_axis: str):
    """Reduce a per-device overflow count to the replicated global total."""
    axes = [axis_name]
    if data_axis in mesh.shape and mesh.shape[data_axis] > 1:
        axes.append(data_axis)
    return jax.lax.psum(overflow.astype(jnp.float32), tuple(axes))


def _token_chunk(ids_flat: jnp.ndarray, axis_name: str, n_shards: int):
    """Split the (replicated-over-model) token stream across the model group.

    Each model-shard device handles 1/n_shards of the tokens — without this,
    every device in the group would issue the FULL request set and comm would
    multiply by n_shards instead of dividing by it.
    Returns (my_chunk, padded_total).
    """
    t = ids_flat.shape[0]
    t_pad = _round_up(t, n_shards)
    ids_flat = jnp.pad(ids_flat, (0, t_pad - t))
    chunk = t_pad // n_shards
    my = jax.lax.axis_index(axis_name)
    mine = jax.lax.dynamic_slice(ids_flat, (my * chunk,), (chunk,))
    return mine, t_pad


def alltoall_kshift_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    num_shifts: int,
    *,
    axis_name: str = "model",
    data_axis: str = "data",
    normalize_output: bool = False,
    compute_dtype: Optional[jnp.dtype] = None,
    capacity_factor: float = 2.0,
    return_overflow: bool = False,
):
    """KShift lookup via the unique-ID all-to-all schedule.

    With ``return_overflow`` the second output is the GLOBAL count of unique
    row requests dropped by the static all-to-all capacity (psum over the
    mesh) — silent zero embeddings otherwise, so surface it as a metric.

    Numerically identical to :func:`sharded_kshift_lookup` (same rotated-hash
    row indices, same scaling); only the collective schedule differs: tokens
    are split across the model group, each device resolves its slice through
    the dedup/all-to-all exchange and sums its k rows locally, and one
    all_gather replicates the finished (tokens, d) activations.  Per-device
    comm ~= unique_rows/n · (4 + d·itemsize) + tokens·d·4, vs the psum
    schedule's 2·tokens·d·4 all-reduce.
    """
    num_embeddings = table.shape[0]
    n_shards = mesh.shape[axis_name]
    assert num_embeddings % n_shards == 0
    rows_per_shard = num_embeddings // n_shards

    def local_fn(table_shard, ids_local):
        shape = ids_local.shape
        t = int(jnp.size(ids_local))
        mine, t_pad = _token_chunk(ids_local.reshape(-1), axis_name, n_shards)
        idx = kshift_row_indices(mine, num_embeddings, num_shifts)  # (chunk, k)
        capacity = resolve_capacity(int(jnp.size(idx)), n_shards, capacity_factor)
        rows, overflow = _unique_alltoall_gather(
            table_shard,
            idx.reshape(-1),
            axis_name=axis_name,
            n_shards=n_shards,
            rows_per_shard=rows_per_shard,
            capacity=capacity,
            compute_dtype=compute_dtype,
        )
        partial = rows.reshape(*idx.shape, -1).sum(axis=-2)  # (chunk, d) f32
        if normalize_output:
            partial = l2_normalize(partial)
        else:
            partial = partial / math.sqrt(num_shifts)
        if n_shards > 1:
            out = jax.lax.all_gather(partial, axis_name, axis=0, tiled=True)
        else:
            out = partial
        return out[:t].reshape(*shape, -1), _global_overflow(
            overflow, mesh, axis_name, data_axis
        )

    extra = ids.ndim - 1
    out, overflow = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(data_axis, *([None] * extra))),
        out_specs=(P(data_axis, *([None] * extra), None), P()),
        check_vma=False,
    )(table, ids)
    if return_overflow:
        return out, overflow
    return out


def alltoall_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    data_axis: str = "data",
    compute_dtype: Optional[jnp.dtype] = None,
    capacity_factor: float = 2.0,
    return_overflow: bool = False,
):
    """Plain row-sharded gather (table[id mod P]) via unique-ID all-to-all."""
    num_embeddings = table.shape[0]
    n_shards = mesh.shape[axis_name]
    assert num_embeddings % n_shards == 0
    rows_per_shard = num_embeddings // n_shards

    def local_fn(table_shard, ids_local):
        shape = ids_local.shape
        t = int(jnp.size(ids_local))
        mine, t_pad = _token_chunk(ids_local.reshape(-1), axis_name, n_shards)
        idx = jnp.mod(mine.astype(jnp.int64), num_embeddings)
        capacity = resolve_capacity(idx.shape[0], n_shards, capacity_factor)
        rows, overflow = _unique_alltoall_gather(
            table_shard,
            idx,
            axis_name=axis_name,
            n_shards=n_shards,
            rows_per_shard=rows_per_shard,
            capacity=capacity,
            compute_dtype=compute_dtype,
        )
        if n_shards > 1:
            out = jax.lax.all_gather(rows, axis_name, axis=0, tiled=True)
        else:
            out = rows
        return out[:t].reshape(*shape, -1), _global_overflow(
            overflow, mesh, axis_name, data_axis
        )

    extra = ids.ndim - 1
    out, overflow = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(data_axis, *([None] * extra))),
        out_specs=(P(data_axis, *([None] * extra), None), P()),
        check_vma=False,
    )(table, ids)
    if return_overflow:
        return out, overflow
    return out


class ShardedKShiftEmbedding(nn.Module):
    """Flax KShiftEmbedding over a row-sharded table.

    Numerically identical to ``nn.KShiftEmbedding`` (same rotated-hash
    indices, same 1/√k or L2 scaling) — tested for exact parity on a virtual
    mesh.  The parameter carries a sharding annotation so ``shard_params``
    places rows on the 'model' axis.
    """

    num_embeddings: int
    features: int
    mesh: Mesh
    num_shifts: int = 8
    normalize_output: bool = False
    axis_name: str = "model"
    data_axis: str = "data"
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: Optional[jnp.dtype] = None
    # 'alltoall' (unique-ID exchange, the pod-scale schedule) or 'psum'
    # (owned-row all-reduce; comm independent of row reuse)
    schedule: str = "alltoall"
    capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        n_shards = self.mesh.shape[self.axis_name]
        rows = ((self.num_embeddings + n_shards - 1) // n_shards) * n_shards
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (rows, self.features),
            self.param_dtype,
        )
        if self.schedule == "alltoall":
            out, overflow = alltoall_kshift_lookup(
                table,
                ids,
                self.mesh,
                self.num_shifts,
                axis_name=self.axis_name,
                data_axis=self.data_axis,
                normalize_output=self.normalize_output,
                compute_dtype=self.compute_dtype,
                capacity_factor=self.capacity_factor,
                return_overflow=True,
            )
            # surfaced by the train step as embedding_alltoall_overflow; a
            # sustained nonzero count means silent zero embeddings — raise
            # capacity_factor (sizing rule in the module docstring)
            self.sow("intermediates", "alltoall_overflow", overflow)
            return out
        return sharded_kshift_lookup(
            table,
            ids,
            self.mesh,
            self.num_shifts,
            axis_name=self.axis_name,
            data_axis=self.data_axis,
            normalize_output=self.normalize_output,
            compute_dtype=self.compute_dtype,
        )
