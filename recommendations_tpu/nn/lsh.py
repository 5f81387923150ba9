"""LSH / numeric-vector embedding library.

Re-design of reference ``commons/transformers/layers.py:426-595``: random-
projection cosine-LSH embeddings of float vectors, quantile scalar mappers,
and their learnable (Gaussian soft-binning) variants.

Fixed random projections are non-trainable and live in the ``constants``
variable collection (the reference registers them as torch buffers); the
train step differentiates w.r.t. the ``params`` collection only.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommendations_tpu.nn.functional import l2_normalize

CONSTANTS = "constants"


def _bucketize(x: jnp.ndarray, boundaries: jnp.ndarray) -> jnp.ndarray:
    """torch.bucketize(right=False) ≡ searchsorted(side='left').

    Computed as a comparison count ``#{b : b < x}`` rather than
    ``jnp.searchsorted``: the boundary vectors here are tiny (≤ 21 entries),
    and XLA lowers searchsorted to a serial while-loop binary search with
    per-element boundary gathers — measured at 86 ms/step (40% of the LTHM
    bench step) vs one fused VPU pass for the broadcast compare-sum.
    """
    cmp = boundaries < x[..., None]
    return jnp.sum(cmp, axis=-1).astype(jnp.int32)


class SimhashVectorIndexer(nn.Module):
    """Random-projection sign bits packed into an int code.

    Reference ``commons/transformers/layers.py:426-437``.
    """

    inp_dim: int
    n_proj: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        proj = self.variable(
            CONSTANTS,
            "projection_mat",
            lambda: jax.random.normal(
                self.make_rng("params"), (self.inp_dim, self.n_proj), jnp.float32
            )
            / math.sqrt(float(self.inp_dim)),
        ).value
        z = (x @ proj) > 0
        bits = jnp.arange(self.n_proj, dtype=jnp.int64)
        return jnp.sum(z.astype(jnp.int64) << bits, axis=-1)


class CosineVectorEmbedding(nn.Module):
    """Multi-resolution cosine-LSH embedding of a float vector.

    Reference ``commons/transformers/layers.py:443-471``: L2-normalize, apply
    ``n_proj`` fixed unit projections, bucketize each into ``num_bins+1``
    buckets on [-1, 1], offset per projection, and sum the looked-up rows
    (EmbeddingBag(sum)).  The gather+sum here is one batched ``take`` plus a
    reduction — XLA fuses it into a single pass.
    """

    inp_dim: int
    features: int
    n_proj: int = 16
    num_bins: int = 20
    param_dtype: jnp.dtype = jnp.float32
    # matmul operand dtype; bf16 keeps fwd AND bwd (table grad) on the MXU
    # fast path.  Pass float32 for bit-tight oracle comparisons.
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        proj = self.variable(
            CONSTANTS,
            "projection_mat",
            lambda: l2_normalize(
                jax.random.normal(
                    self.make_rng("params"), (self.inp_dim, self.n_proj), jnp.float32
                ),
                axis=0,
            ),
        ).value
        resolution = 2.0 / float(self.num_bins)
        grid = (
            jnp.linspace(-1.0, 1.0, self.num_bins + 1)[:-1] + 0.5 * resolution
        ).astype(jnp.float32)
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            ((self.num_bins + 1) * self.n_proj, self.features),
            self.param_dtype,
        )
        z = l2_normalize(x) @ proj  # (..., n_proj)
        buckets = _bucketize(z, grid).astype(jnp.int32)  # values in [0, nb+1)
        # EmbeddingBag(sum) as ONE one-hot matmul: each projection owns a
        # disjoint (num_bins+1)-class slice, so the (..., n_proj, nb+1)
        # indicator reshaped to (..., classes) matmuls the whole table.  The
        # MXU does the forward and the backward is the transposed matmul —
        # no serialized scatter-add (this was the LTHM step's hotspot).
        nb1 = self.num_bins + 1
        ct = jnp.dtype(self.compute_dtype)
        onehot = (
            buckets[..., None] == jnp.arange(nb1, dtype=jnp.int32)
        ).astype(ct)
        onehot = onehot.reshape(*buckets.shape[:-1], self.n_proj * nb1)
        # output stays in compute dtype through the dot so the backward
        # cotangent is cast back at the astype boundary (all-bf16 bwd matmul)
        return jnp.einsum("...n,nd->...d", onehot, table.astype(ct)).astype(
            table.dtype
        )


class QuantileMapper(nn.Module):
    """Bucketize by precomputed quantiles → centered scalar in [-0.5, 0.5].

    Reference ``commons/transformers/layers.py:477-487``.
    """

    quantiles: Tuple[float, ...]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        q = jnp.asarray(self.quantiles, dtype=jnp.float32)
        n_bins = len(self.quantiles) + 1
        bins = _bucketize(x.astype(jnp.float32), q)
        return bins.astype(jnp.float32) / float(n_bins) - 0.5


class DenseMapper(nn.Module):
    """All numeric features → quantile scalars → concat → Σ CosineVectorEmbeddings.

    Reference ``commons/transformers/layers.py:490-511``.  ``stats`` maps
    feature name → quantile list (the stats-job output the reference
    configures at ``lthm_train.yaml:57-72`` but never computes).
    """

    stats: Dict[str, Tuple[float, ...]]
    features: int
    n_projs: Sequence[int]
    num_bins: Sequence[int]

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        assert len(self.n_projs) == len(self.num_bins)
        parts = []
        for name in self.stats:
            parts.append(QuantileMapper(tuple(self.stats[name]), name=f"q_{name}")(
                batch[name].reshape(-1, 1)
            ))
        x = jnp.concatenate(parts, axis=1)[:, None, :]  # (bs, 1, n_feats)
        out = None
        for i, (npj, nb) in enumerate(zip(self.n_projs, self.num_bins)):
            emb = CosineVectorEmbedding(
                len(self.stats), self.features, n_proj=npj, num_bins=nb, name=f"emb_{i}"
            )(x)
            out = emb if out is None else out + emb
        return out[:, 0, :]


class CosineLinear(nn.Module):
    """Cosine-similarity linear layer — reference ``transformers/layers.py:517-524``."""

    out_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp_dim = x.shape[-1]
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / math.sqrt(float(inp_dim))),
            (self.out_dim, inp_dim),
            self.param_dtype,
        )
        return l2_normalize(x) @ l2_normalize(w, axis=-1).T


def _topk_sparsify(act: jnp.ndarray, top_k: Optional[int]) -> jnp.ndarray:
    if top_k is None:
        return act
    vals = jax.lax.top_k(act, top_k)[0]
    thresh = vals[..., -1:]
    return jnp.where(act < thresh, 0.0, act)


class LearnableCosineVectorEmbedding(nn.Module):
    """Learned projections + Gaussian soft binning + top-k sparsification.

    Reference ``commons/transformers/layers.py:530-563``.
    """

    inp_dim: int
    features: int
    n_proj: int = 16
    num_bins: int = 20
    sigma_inflation_factor: float = 1.0
    top_k: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        top_k = None if self.top_k is None else min(self.top_k, self.num_bins)
        sigma2 = (self.sigma_inflation_factor * 2.0 / self.num_bins) ** 2
        z = CosineLinear(self.n_proj, name="proj")(x)  # (..., n_proj)
        mean = self.param(
            "mean",
            lambda key, shape: 2.0 * jax.random.uniform(key, shape) - 1.0,
            (1, 1, self.n_proj, self.num_bins),
        )
        diff = z[..., None] - mean
        act = jnp.exp(-0.5 * diff * diff / sigma2)
        act = l2_normalize(_topk_sparsify(act, top_k))
        flat = act.reshape(*act.shape[:-2], self.n_proj * self.num_bins)
        return nn.Dense(self.features, use_bias=False, name="emb")(flat)


class ProbabilityVectorEmbedding(nn.Module):
    """Gaussian soft binning of a scalar in [0, 1].

    Reference ``commons/transformers/layers.py:569-595``.
    """

    features: int
    num_bins: int = 10
    sigma_inflation_factor: float = 1.0
    top_k: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != 1:
            raise ValueError("ProbabilityVectorEmbedding expects input dim 1")
        top_k = None if self.top_k is None else min(self.top_k, self.num_bins)
        sigma2 = (self.sigma_inflation_factor * 1.0 / self.num_bins) ** 2
        mean = self.param(
            "mean", lambda key, shape: jax.random.uniform(key, shape), (1, self.num_bins)
        )
        diff = x - mean  # (bs, num_bins) via broadcast of (bs,1)
        act = jnp.exp(-0.5 * diff * diff / sigma2)
        act = l2_normalize(_topk_sparsify(act, top_k))
        return nn.Dense(self.features, use_bias=False, name="emb")(act)
