"""Lazy row-sparse embedding-table updates.

The reference trains embeddings with ``nn.Embedding(sparse=True)`` + sparse
optimizers (``commons/layers.py:137,146``, ``base_model_wrapper.py:51-72``)
— i.e. LAZY semantics: only rows touched by the batch get moment updates.
The generic optax path instead rewrites the full (N, d) table and its
moments every step; at the 10M-row BASELINE rung that traffic is 10.2
ms/step (measured, /tmp micro split) — 13% of the whole step — while the
batch touches <=2% of rows.

``lazy_rowwise_adam_update`` does the TPU-native version: find the touched
rows from the dense gradient (one fused any!=0 pass), compact their indices
to a STATIC capacity (batch geometry bounds the touched-row count), gather
rows of (table, m, v), apply rowwise Adam (second moment per ROW, as
``train/optimizers.rowwise_adam``), and scatter back. Traffic = one read
of the gradient + O(capacity x d), instead of ~5 full-table passes.

Semantics (documented deviation, matching torch's LazyAdam / the
reference's sparse optimizers): untouched rows' moments do NOT decay, and
bias correction uses the global step count. Weight decay is not applied
(embedding tables are trained without it here, as in the reference's
Adagrad/SparseAdam usage).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Fused-record sparse path (round 4).
#
# Measured on v5e (tools_bench_table.py, 131K touched rows):
#   - XLA scatter into a (V, 32) table:   ~170-220 ns/row  (a 21-30 ms wall
#     that makes EVERY per-row update scheme lose at V=10M)
#   - XLA scatter into (V, 128) records:   ~66 ns/row      (full 512B HBM
#     lines; the per-row dynamic-update-slice overhead amortizes)
#   - Pallas per-row DMA (gather or RMW):  50-270 ns/row   (issue-bound;
#     measured prototypes LOSE to the 128-lane XLA scatter)
#   - jnp.nonzero over the 10M-row table (the lazy path's touched-row scan):
#     ~sort-bound, 969 ms — catastrophic; compact cotangents avoid it.
#
# Conclusion: the TPU-native answer to sparse embedding updates is LAYOUT,
# not a kernel. The table, its first moment, and its rowwise second moment
# live in ONE (V, 128) f32 record  [table d | m d | v 1 | pad]  so the whole
# optimizer step is ONE row gather + ONE row scatter on full HBM lines, fed
# by a compact per-batch cotangent (the "tap" — gradient w.r.t. the gathered
# rows, shape (tokens, k, d)) that never materializes a dense (V, d) grad.
# ---------------------------------------------------------------------------

RECORD_LANES = 128


class FusedTableState(NamedTuple):
    count: jnp.ndarray  # () int32 global step (bias correction)


def fused_record_init(key, num_embeddings: int, features: int,
                      stddev: float = 1.0) -> jnp.ndarray:
    """(V, 128) f32 record: table cols normal-init, moments/pad zero.

    Built as one fused zeros + dynamic_update_slice under jit — an eager
    concat holds inputs AND output live (10.2 GB at V=10M), which exceeds
    the single-op working-set budget on the tunneled v5e (observed
    RESOURCE_EXHAUSTED / allocation stalls); the fused form peaks at the
    output + table block only.
    """
    if 2 * features + 1 > RECORD_LANES:
        raise ValueError(
            f"fused record needs 2*d+1 <= {RECORD_LANES}, got d={features}"
        )

    @jax.jit
    def _build(k):
        rec = jnp.zeros((num_embeddings, RECORD_LANES), jnp.float32)
        table = stddev * jax.random.normal(
            k, (num_embeddings, features), jnp.float32
        )
        return jax.lax.dynamic_update_slice(rec, table, (0, 0))

    return _build(key)


def fused_record_table(record: jnp.ndarray, features: int) -> jnp.ndarray:
    """The (V, d) table view of a fused record (for export/offline use;
    the training forward slices per gathered row instead)."""
    return record[:, :features]


def sparse_fused_adam_update(
    record: jnp.ndarray,
    idx_flat: jnp.ndarray,
    grad_rows: jnp.ndarray,
    state: FusedTableState,
    *,
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, FusedTableState]:
    """Rowwise-Adam on exactly the rows the batch touched — no dense grad.

    record: (V, 128) fused [table d | m d | v 1 | pad];
    idx_flat: (M,) int row ids (duplicates allowed — the per-row gradient is
    the segment SUM over duplicates, identical to a dense-scatter grad);
    grad_rows: (M, d) cotangent of the gathered rows (the tap gradient).

    Unlike ``lazy_rowwise_adam_update`` there is no capacity bound and no
    dropped-gradient case: every distinct touched row updates every step.
    Semantics otherwise match (global-count bias correction, no decay of
    untouched moments, no weight decay).

    Returns ``(new_record, new_state, rows_nan)`` — ``rows_nan`` is a bool
    scalar: any non-finite value among the rows being written this step.
    The dense params_nan watchdog deliberately excludes the (V, 128) record
    (a full-table any-NaN pass is the exact cost this path removes); this
    compact check covers the only rows that CHANGE, so the step a NaN
    enters the table is flagged — and, because a poisoned row re-trips the
    check whenever it is touched again, a persisted NaN cannot ride
    undetected through later steps that use it (ADVICE r4 #1).
    """
    v_rows, lanes = record.shape
    m = idx_flat.shape[0]
    d = grad_rows.shape[-1]
    count = state.count + 1

    si, order = jax.lax.sort_key_val(
        idx_flat.astype(jnp.int32), jnp.arange(m, dtype=jnp.int32)
    )
    sg = jnp.take(grad_rows.astype(jnp.float32), order, axis=0)

    # segment sums over duplicate ids: associative scan keyed on the sorted
    # ids; each segment's END row holds the full sum
    def comb(a, b):
        ka, va = a
        kb, vb = b
        return kb, jnp.where((ka == kb)[:, None], va + vb, vb)

    _, acc = jax.lax.associative_scan(comb, (si, sg))
    is_end = jnp.concatenate(
        [si[1:] != si[:-1], jnp.ones((1,), bool)]
    )
    # rows whose batch gradient sums to zero (masked/padding tokens) are
    # skipped entirely — same semantics as lazy_rowwise_adam's grad!=0
    # filter: no spurious moment decay on rows the loss never saw
    is_end = is_end & jnp.any(acc != 0, axis=1)
    # non-end positions become out-of-range rows: their gathers are masked
    # and their scatters dropped — no nonzero/compaction pass needed
    uidx = jnp.where(is_end, si, jnp.int32(v_rows))
    safe = jnp.where(is_end, si, 0)
    g_sum = jnp.where(is_end[:, None], acc, 0.0)

    rows = jnp.take(record, safe, axis=0)  # (M, 128) one fused gather
    t_rows = rows[:, :d]
    m_rows = rows[:, d : 2 * d]
    v_row = rows[:, 2 * d : 2 * d + 1]

    new_m = b1 * m_rows + (1.0 - b1) * g_sum
    g2 = jnp.mean(jnp.square(g_sum), axis=1, keepdims=True)
    new_v = b2 * v_row + (1.0 - b2) * g2
    c = count.astype(jnp.float32)
    mhat = new_m / (1.0 - jnp.float32(b1) ** c)
    vhat = new_v / (1.0 - jnp.float32(b2) ** c)
    new_t = t_rows - learning_rate * mhat / (jnp.sqrt(vhat) + eps)

    # COMPILE-TIME LANDMINE (round-5 bisect, v5e, V=10M, M=135K): letting
    # the Adam row epilogue (the (M, 1) mean-reduce second moment and its
    # sqrt/divide chain) fuse into the (V, 128) scatter operand sends the
    # XLA:TPU compile to 21-45 MINUTES. Isolated probes: scatter alone
    # 0.5 s; sort+segmented-scan 11.4 s; the full graph with a REDUCE-FREE
    # epilogue 11.5-17.5 s; the same graph with the real epilogue (either
    # concatenate- or dynamic_update_slice-assembled) 21-45 min. The
    # optimization_barrier materializes the assembled rows (66 MB at this
    # shape, ~0.2 ms of HBM) and cuts the scatter off from the reduce
    # chain — compile drops to seconds (QUALITY.md round 5).
    new_rows = jax.lax.dynamic_update_slice(rows, new_t, (0, 0))
    new_rows = jax.lax.dynamic_update_slice(new_rows, new_m, (0, d))
    new_rows = jax.lax.dynamic_update_slice(new_rows, new_v, (0, 2 * d))
    new_rows = jax.lax.optimization_barrier(new_rows)
    new_record = record.at[uidx].set(new_rows, mode="drop")
    rows_nan = jnp.any(
        ~jnp.isfinite(new_rows) & is_end[:, None]
    )
    return new_record, FusedTableState(count=count), rows_nan


class LazyRowState(NamedTuple):
    m: jnp.ndarray  # (N, d) first moment
    v: jnp.ndarray  # (N, 1) rowwise second moment
    count: jnp.ndarray  # () int32 global step (bias correction)


def init_lazy_row_state(table: jnp.ndarray) -> LazyRowState:
    return LazyRowState(
        m=jnp.zeros_like(table),
        v=jnp.zeros((table.shape[0], 1), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def lazy_rowwise_adam_update(
    table: jnp.ndarray,
    grad: jnp.ndarray,
    state: LazyRowState,
    *,
    learning_rate: float,
    capacity: int,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, LazyRowState]:
    """One lazy rowwise-Adam step on the rows ``grad`` actually touches.

    ``capacity``: static upper bound on touched rows (for KShift lookups it
    is at most ``batch_tokens * num_shifts``; overflowing rows past the
    bound keep their gradient UNAPPLIED that step — size it from batch
    geometry so this cannot happen).
    """
    n, d = table.shape
    cap = int(min(capacity, n))
    count = state.count + 1

    active = jnp.any(grad != 0, axis=1)
    # static-size compaction; fill rows point past the table and are
    # dropped by the scatters
    (idx,) = jnp.nonzero(active, size=cap, fill_value=n)
    ok = idx < n
    safe = jnp.where(ok, idx, 0).astype(jnp.int32)

    g_rows = jnp.take(grad, safe, axis=0).astype(jnp.float32)
    g_rows = jnp.where(ok[:, None], g_rows, 0.0)
    m_rows = jnp.take(state.m, safe, axis=0).astype(jnp.float32)
    v_rows = jnp.take(state.v, safe, axis=0)

    new_m = b1 * m_rows + (1.0 - b1) * g_rows
    g2 = jnp.mean(jnp.square(g_rows), axis=1, keepdims=True)
    new_v = b2 * v_rows + (1.0 - b2) * g2

    c = count.astype(jnp.float32)
    mhat = new_m / (1.0 - jnp.float32(b1) ** c)
    vhat = new_v / (1.0 - jnp.float32(b2) ** c)
    upd = (-learning_rate * mhat / (jnp.sqrt(vhat) + eps)).astype(table.dtype)
    upd = jnp.where(ok[:, None], upd, 0.0)

    new_table = table.at[idx].add(upd, mode="drop")
    m_out = state.m.at[idx].set(
        jnp.where(ok[:, None], new_m.astype(state.m.dtype), 0.0),
        mode="drop",
    )
    v_out = state.v.at[idx].set(
        jnp.where(ok[:, None], new_v, 0.0), mode="drop",
    )
    return new_table, LazyRowState(m=m_out, v=v_out, count=count)
