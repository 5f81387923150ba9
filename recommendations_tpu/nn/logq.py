"""Streaming logQ estimator for sampled-softmax correction.

Functional rebuild of the reference's streaming item-frequency estimator
(``commons/layers.py:189-237``, after the Google "sampling-bias-corrected
neural retrieval" method, research.google/pubs/pub48840): per hash bucket,
``b[h]`` is an EMA of the gap (in batch indices) between consecutive sightings
of bucket ``h`` — an estimate of 1/p(item) — and ``logQ(id) = -log b[h]``.
The cascaded variant takes the elementwise min over several hash offsets
(count-min-sketch style) before the log.

The reference mutates torch buffers imperatively inside ``train_step`` (and
has two latent bugs there, SURVEY.md §2.5#12: ``self.alpha[hash]=`` should be
``self.a[hash]=`` and the cascade calls ``mod.train_Step`` on an enumerate
tuple).  Here the estimator is explicit jit-safe state threaded through the
train step, so it composes with pjit: with batch-sharded ids the state update
runs on the *global* batch, giving every host the same frequency estimates
(the reference's per-rank buffers silently diverge across DDP workers).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class LogQState(NamedTuple):
    # b: (n_offsets, num_buckets) EMA of batch-index gaps (≈ 1 / p̂).
    b: jnp.ndarray
    # a: (n_offsets, num_buckets) batch index of the last sighting.
    a: jnp.ndarray
    # hash_offsets: (n_offsets,) int64 — static per config, carried for purity.
    hash_offsets: jnp.ndarray


def init_logq_state(
    num_buckets: int, hash_offsets: Sequence[int], p_init: float = 0.01
) -> LogQState:
    n = len(hash_offsets)
    return LogQState(
        b=jnp.full((n, num_buckets), 1.0 / p_init, dtype=jnp.float32),
        a=jnp.zeros((n, num_buckets), dtype=jnp.float32),
        hash_offsets=jnp.asarray(hash_offsets, dtype=jnp.int64),
    )


def _buckets(state: LogQState, ids: jnp.ndarray) -> jnp.ndarray:
    """(n_offsets, *ids.shape) int32 bucket per offset.

    Reference hash (``layers.py:206-208``): (id + offset) mod num_buckets.
    """
    num_buckets = state.b.shape[1]
    flat = ids.reshape(-1).astype(jnp.int64)
    h = jnp.mod(flat[None, :] + state.hash_offsets[:, None], num_buckets)
    return h.astype(jnp.int32)


def logq_update(
    state: LogQState,
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    batch_idx: jnp.ndarray,
    alpha: float = 0.05,
) -> LogQState:
    """One streaming step over the ids seen in this batch.

    ``valid`` is a bool mask of ``ids.shape`` (True = real token; the
    reference filters padded ids before the update, ``wrapper.py:133-135``).
    Duplicate buckets within a batch collapse to a single update (last-write
    scatter), matching torch ``index_put_(accumulate=False)``.
    """
    h = _buckets(state, ids)  # (n_off, N)
    v = valid.reshape(-1)
    bi = jnp.asarray(batch_idx, dtype=jnp.float32)

    def _one(b_row, a_row, h_row):
        gap = bi - a_row[h_row]
        new_b_vals = (1.0 - alpha) * b_row[h_row] + alpha * gap
        b_new = b_row.at[h_row].set(jnp.where(v, new_b_vals, b_row[h_row]))
        a_new = a_row.at[h_row].set(jnp.where(v, bi, a_row[h_row]))
        return b_new, a_new

    b_new, a_new = jax.vmap(_one)(state.b, state.a, h)
    return LogQState(b=b_new, a=a_new, hash_offsets=state.hash_offsets)


def logq_correction(state: LogQState, ids: jnp.ndarray) -> jnp.ndarray:
    """logQ(id) = -log(min_offsets b[h(id)]), shape = ids.shape."""
    h = _buckets(state, ids)  # (n_off, N)
    vals = jax.vmap(lambda b_row, h_row: b_row[h_row])(state.b, h)
    min_b = jnp.min(vals, axis=0)
    return (-jnp.log(min_b)).reshape(ids.shape)
