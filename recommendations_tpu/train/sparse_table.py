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
