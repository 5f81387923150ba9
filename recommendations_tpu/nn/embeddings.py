"""Embedding-layer library.

jnp/Flax re-designs of the reference's hash-embedding family
(``commons/layers.py``): FlatEmbedding, QREmbedding, KShiftEmbedding, the
time-pattern embedding, plus HistogramEmbedding (referenced by the product
tower at ``models/lthm/sequence/product_tower.py:6`` but never committed —
implemented here from its call-site intent).

TPU notes:
- All IDs are int64 (full xxh64 range; see package ``__init__``).  Index math
  happens in int64/uint64 and collapses to int32 just before the gather so
  XLA emits a native TPU gather.
- ``KShiftEmbedding`` computes all k rotated indices at once and performs one
  batched gather of shape ``(..., k, d)`` followed by a sum — one fused HLO
  instead of the reference's python loop of k sequential lookups
  (``commons/layers.py:157-164``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommendations_tpu.nn.functional import l2_normalize, quick_gelu


def _take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows with an int32 index (XLA-native TPU gather)."""
    return jnp.take(table, idx.astype(jnp.int32), axis=0)


# Below this row count, embedding lookups run as one-hot matmuls instead of
# gathers: the forward rides the MXU and — decisively — the backward becomes
# a matmul instead of a serialized TPU scatter-add (ablations showed the
# scatter-add backward of small-table gathers dominating the LTHM step).
ONEHOT_LOOKUP_MAX_ROWS = 4096


def onehot_lookup(
    table: jnp.ndarray, idx: jnp.ndarray, compute_dtype: Optional[jnp.dtype] = None
) -> jnp.ndarray:
    """table[idx] via one-hot @ table (idx values must be in-range).

    ``compute_dtype=bfloat16`` runs the matmul (and its backward) with bf16
    operands — rows come back bf16-rounded, which is fine inside a bf16
    residual stream; leave ``None`` for exact rows.
    """
    n = table.shape[0]
    ct = jnp.dtype(compute_dtype) if compute_dtype is not None else table.dtype
    oh = (idx[..., None].astype(jnp.int32) == jnp.arange(n, dtype=jnp.int32)).astype(ct)
    return jnp.einsum("...n,nd->...d", oh, table.astype(ct)).astype(table.dtype)


def small_table_lookup(
    table: jnp.ndarray, idx: jnp.ndarray, compute_dtype: Optional[jnp.dtype] = None
) -> jnp.ndarray:
    if table.shape[0] <= ONEHOT_LOOKUP_MAX_ROWS:
        return onehot_lookup(table, idx, compute_dtype)
    return _take_rows(table, idx)


class FlatEmbedding(nn.Module):
    """Remainder-hashed full-range-int64 embedding.

    Reference ``commons/layers.py:44-61``: ``table[x mod N]`` with optional
    L2-normalized output and zero init.
    """

    num_embeddings: int
    features: int
    zero_init: bool = False
    normalize_output: bool = False
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: Optional[jnp.dtype] = None  # bf16 for hot paths

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        init = (
            nn.initializers.zeros
            if self.zero_init
            else nn.initializers.normal(stddev=1.0)
        )
        table = self.param(
            "embedding", init, (self.num_embeddings, self.features), self.param_dtype
        )
        if not jnp.issubdtype(jnp.asarray(ids).dtype, jnp.integer):
            raise TypeError(f"hash ids must be integers, got {jnp.asarray(ids).dtype}")
        idx = jnp.mod(ids.astype(jnp.int64), self.num_embeddings)
        x = small_table_lookup(table, idx, self.compute_dtype)
        if self.normalize_output:
            x = l2_normalize(x)
        return x


class QREmbedding(nn.Module):
    """Quotient-remainder two-table trick (√N rows each).

    Reference ``commons/layers.py:102-123``; two tables of ``isqrt(N)`` rows,
    summed lookups, optional L2 norm.
    """

    num_embeddings: int
    features: int
    normalize_output: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        div = int(math.isqrt(self.num_embeddings))
        n = div * div
        init = nn.initializers.normal(stddev=1.0)
        emb_q = self.param("emb_q", init, (div, self.features), self.param_dtype)
        emb_r = self.param("emb_r", init, (div, self.features), self.param_dtype)
        if not jnp.issubdtype(jnp.asarray(ids).dtype, jnp.integer):
            raise TypeError(f"hash ids must be integers, got {jnp.asarray(ids).dtype}")
        x = jnp.mod(ids.astype(jnp.int64), n)
        q = jnp.mod(x // div, div)
        r = jnp.mod(x, div)
        out = _take_rows(emb_q, q) + _take_rows(emb_r, r)
        if self.normalize_output:
            out = l2_normalize(out)
        return out


def kshift_row_indices(
    ids: jnp.ndarray, num_embeddings: int, num_shifts: int
) -> jnp.ndarray:
    """All k rotated-hash row indices for each id: shape ``ids.shape + (k,)``.

    Row index c = rotl64(id, c) mod N — the k pseudo-independent hash
    functions of reference ``commons/layers.py:174-185`` with the *intended*
    unsigned 64-bit rotation (torch's ``>>`` sign-extends negative ids, which
    corrupts the rotation; the cited paper arXiv:2207.10731 means a true bit
    rotation).
    """
    if not jnp.issubdtype(jnp.asarray(ids).dtype, jnp.integer):
        raise TypeError(f"hash ids must be integers, got {jnp.asarray(ids).dtype}")
    u = ids.astype(jnp.uint64)
    rots = []
    for c in range(num_shifts):
        if c == 0:
            rots.append(u)
        else:
            rots.append((u << c) | (u >> (64 - c)))
    stacked = jnp.stack(rots, axis=-1)
    return jnp.mod(stacked, jnp.uint64(num_embeddings)).astype(jnp.int64)


class KShiftEmbedding(nn.Module):
    """k-shift parameter-shared compressed embedding.

    Reference ``commons/layers.py:125-185``: one shared table; each 64-bit id
    maps to k rows via bit rotations; rows are summed and scaled by 1/√k (JL
    scaling) or L2-normalized.  This is the workhorse for compressed product
    vocabularies (the offline compressor ``embedding_module_gen.py`` distills
    pretrained embeddings into this module).

    The row-sharded multi-chip variant lives in
    ``recommendations_tpu/parallel/sharded_embedding.py``; this module is the
    single-shard math.
    """

    num_embeddings: int
    features: int
    num_shifts: int = 8
    normalize_output: bool = False
    param_dtype: jnp.dtype = jnp.float32
    # bf16 halves the gathered row bytes AND the backward scatter-add row
    # bytes — both are row-transfer-bound on TPU (measured ~1.7x on the
    # 1M-row LTHM table). The f32 master table is cast once per step; the
    # table gradient comes back as one bf16→f32 convert.
    compute_dtype: Optional[jnp.dtype] = None
    # fused-record sparse mode (train/sparse_table): the param is a (V, 128)
    # f32 record [table d | m d | v 1 | pad] updated OUTSIDE autodiff — the
    # lookup stops gradients to the record and routes the row cotangent
    # through the compact ``tap`` argument instead (no dense (V, d) grad, no
    # full-table cast: rows slice+cast AFTER the gather). Wins where dense
    # table passes dominate (large V); see sparse_table.py for measurements.
    fused_record: bool = False

    @nn.compact
    def __call__(
        self, ids: jnp.ndarray, tap: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        idx = kshift_row_indices(ids, self.num_embeddings, self.num_shifts)
        if self.fused_record:
            from recommendations_tpu.train.sparse_table import (
                RECORD_LANES, fused_record_init,
            )

            record = self.param(
                "embedding",
                lambda key, _shape, _dtype=None: fused_record_init(
                    key, self.num_embeddings, self.features
                ),
                (self.num_embeddings, RECORD_LANES),
                jnp.float32,
            )
            rows = jnp.take(
                jax.lax.stop_gradient(record), idx.astype(jnp.int32), axis=0
            )[..., : self.features]
            if self.compute_dtype is not None:
                rows = rows.astype(self.compute_dtype)
            if tap is not None:
                rows = rows + tap.astype(rows.dtype)
            x = rows
        else:
            table = self.param(
                "embedding",
                nn.initializers.normal(stddev=1.0),
                (self.num_embeddings, self.features),
                self.param_dtype,
            )
            if self.compute_dtype is not None:
                table = table.astype(self.compute_dtype)
            # gather whose backward is a two-level bucketed scatter-add
            # (ops/bucketed_scatter): XLA's serialized scatter was ~10ms/step
            # on the 1M-row LTHM table; on-chip per-bucket accumulation
            # halves it
            from recommendations_tpu.ops.bucketed_scatter import gather_rows

            x = gather_rows(table, idx)  # (..., k, d)
        x = jnp.sum(x, axis=-2).astype(jnp.float32)
        if self.normalize_output:
            return l2_normalize(x)
        return x / math.sqrt(self.num_shifts)


class HistogramEmbedding(nn.Module):
    """Bucketized-scalar embedding over ``[lo, hi]`` with ``num_bins`` bins.

    Implements the intent of the missing reference class (imported at
    ``models/lthm/sequence/product_tower.py:6``, used at ``:32-35,56-57`` to
    embed the pre-normalization L2 norm of a product embedding).  Values are
    clipped into range; each bin owns a learned vector.
    """

    lo: float
    hi: float
    num_bins: int
    features: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_bins, self.features),
            self.param_dtype,
        )
        frac = (x.astype(jnp.float32) - self.lo) / (self.hi - self.lo)
        idx = jnp.clip(
            jnp.floor(frac * self.num_bins).astype(jnp.int32), 0, self.num_bins - 1
        )
        return small_table_lookup(table, idx, self.compute_dtype)


class PatternFromTimelocal(nn.Module):
    """Periodic pattern embedding of an epoch timestamp.

    Reference ``commons/layers.py:14-41``: index = (t // div) % mod.
      hour-of-day: div=3600,  mod=24
      hour-of-week: div=3600, mod=168
      day-of-week: div=86400, mod=7
    """

    div: int
    mod: int
    features: int
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        idx = jnp.mod(t.astype(jnp.int64) // self.div, self.mod).astype(jnp.int32)
        if self.features <= 0:
            return idx
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.mod, self.features),
            self.param_dtype,
        )
        return small_table_lookup(table, idx, self.compute_dtype)


class NAImputationPlusQuantileEmbedding(nn.Module):
    """Quantile-bucket scalar embedding with a learned NA scalar.

    Reference ``commons/layers.py:84-99``: bucketize by precomputed quantiles
    into a learned-scalar table initialised to centered bucket fractions;
    values equal to ``na_value`` map to a dedicated learned parameter.
    """

    na_value: float
    quantiles: Tuple[float, ...]
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.quantiles)

        def _init(key, shape, dtype=jnp.float32):
            return (jnp.arange(0, n - 1, dtype=jnp.float32) / n - 0.5).reshape(shape)

        table = self.param("embedding", _init, (n - 1, 1))
        na_param = self.param("na_param", nn.initializers.zeros, (1,))
        x = x.astype(jnp.float32)
        q = jnp.asarray(self.quantiles, dtype=jnp.float32)
        # comparison-count searchsorted: q is tiny and jnp.searchsorted
        # lowers to a serial binary-search while loop on TPU (see nn/lsh.py)
        idx = jnp.clip(
            jnp.sum(q < x[..., None], axis=-1).astype(jnp.int32), 0, n - 2
        )
        y = jnp.take(table, idx, axis=0)
        is_na = (x - self.na_value) < self.eps
        return jnp.where(is_na[..., None], na_param[None, :], y)


class MLP(nn.Module):
    """QuickGELU-gated MLP — reference ``commons/layers.py:65-81``."""

    out_dim: int
    gate_sizes: Sequence[int] = ()
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for g in self.gate_sizes:
            x = nn.Dense(g, use_bias=self.use_bias, dtype=self.dtype)(x)
            x = quick_gelu(x)
        return nn.Dense(self.out_dim, use_bias=self.use_bias, dtype=self.dtype)(x)
