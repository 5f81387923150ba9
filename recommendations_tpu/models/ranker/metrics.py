"""Ranking metrics computed in-batch inside the jitted step: AUC and NDCG.

These are the quality-parity metrics BASELINE.md names for the ranker path
(the reference never implemented any — ``eval_model`` is ``pass``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_auc(scores: jnp.ndarray, labels: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Rank-statistic AUC (Mann-Whitney U) over a batch; NaN-free: returns
    0.5 when either class is empty."""
    scores = scores.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    if valid is None:
        valid = jnp.ones_like(labels, dtype=bool)
    else:
        valid = valid.reshape(-1)
    pos = (labels > 0.5) & valid
    neg = (labels <= 0.5) & valid
    order = jnp.argsort(scores)
    # ranks (1-based, ties by order; adequate for continuous scores)
    ranks = jnp.empty_like(scores).at[order].set(
        jnp.arange(1, scores.shape[0] + 1, dtype=jnp.float32)
    )
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(neg)
    sum_pos_ranks = jnp.sum(jnp.where(pos, ranks, 0.0))
    u = sum_pos_ranks - n_pos * (n_pos + 1) / 2.0
    auc = u / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, 0.5)


def ndcg_at_k(scores: jnp.ndarray, relevance: jnp.ndarray, k: int) -> jnp.ndarray:
    """NDCG@k per row of (B, L) score/relevance matrices, averaged."""
    k = min(k, scores.shape[-1])
    top = jnp.argsort(-scores, axis=-1)[..., :k]
    gains = jnp.take_along_axis(relevance, top, axis=-1)
    discounts = 1.0 / jnp.log2(jnp.arange(2, k + 2, dtype=jnp.float32))
    dcg = jnp.sum((2.0**gains - 1.0) * discounts, axis=-1)
    ideal = jnp.sort(relevance, axis=-1)[..., ::-1][..., :k]
    idcg = jnp.sum((2.0**ideal - 1.0) * discounts, axis=-1)
    return jnp.mean(dcg / jnp.maximum(idcg, 1e-9))
