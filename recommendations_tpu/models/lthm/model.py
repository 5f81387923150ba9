"""LTHM network: product-embedding module → ProductTower → QueryTower.

Flax rebuild of reference ``models/lthm/sequence/{encoder,product_tower,
query_tower}.py`` with its latent defects fixed (consistent output keys,
declared config fields, correct fresh-KShift dim — SURVEY.md §2.5#2,5,6,7).

Static-shape redesign (the reference's dynamic behaviors don't compile to
one TPU program):
- The reference right-pads history, flips to left padding, then *dynamically*
  trims the all-pad prefix (``query_tower.py:73-87``).  Here the flipped
  sequence is statically sliced to the last ``context_width`` positions (the
  most recent events) and padding is handled by masks.
- All embeddings-additions fuse into the residual stream in one jit trace;
  the KShift gather is batched (see nn/embeddings.py).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommendations_tpu.models.lthm.config import LTHMModelConfig
from recommendations_tpu.nn.embeddings import (
    FlatEmbedding,
    HistogramEmbedding,
    KShiftEmbedding,
    PatternFromTimelocal,
)
from recommendations_tpu.nn.functional import l2_normalize
from recommendations_tpu.nn.lsh import CosineVectorEmbedding
from recommendations_tpu.nn.transformer import TransformerStack


class ProductTower(nn.Module):
    """Detached product embedding → LSH direction + norm-histogram features.

    Reference ``models/lthm/sequence/product_tower.py:10-62``: stop-gradient,
    norm-threshold + pad-id mask, L2 normalize, linear + Σ multi-resolution
    CosineVectorEmbedding + HistogramEmbedding of the pre-norm magnitude,
    zero masked rows, project to the retrieval space.
    """

    config: LTHMModelConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray, x: jnp.ndarray):
        tc = self.config.product_tower
        if tc.detach_item_tower:
            x = jax.lax.stop_gradient(x)
        x = x.astype(jnp.float32)
        x_norm = jnp.linalg.norm(x, axis=-1)
        mask = jnp.logical_or(x_norm < tc.norm_threshold, ids == 0)

        dtype = jnp.dtype(self.config.compute_dtype)
        xn = l2_normalize(x)
        emb = nn.Dense(tc.out_emb_dim, dtype=dtype, name="emb_mapper")(
            xn.astype(dtype)
        ).astype(jnp.float32)
        for i, spec in enumerate(tc.cosine_lsh_config):
            emb = emb + CosineVectorEmbedding(
                inp_dim=tc.inp_emb_dim,
                features=tc.out_emb_dim,
                n_proj=spec.num_proj,
                num_bins=spec.num_bins,
                name=f"direction_emb_{i}",
            )(xn)
        if tc.norm_bins > 1:
            emb = emb + HistogramEmbedding(
                lo=0.0, hi=1.0, num_bins=tc.norm_bins, features=tc.out_emb_dim,
                compute_dtype=dtype, name="norm_emb",
            )(x_norm)

        emb = jnp.where(mask[..., None], 0.0, emb)
        prod_emb = nn.Dense(
            tc.product_emb_dim, use_bias=False, dtype=dtype, name="product_mapper"
        )(emb.astype(dtype)).astype(jnp.float32)
        return emb, prod_emb, mask


class QueryTower(nn.Module):
    """Causal transformer over the (left-padded) interaction sequence with
    multi-horizon prediction heads.

    Reference ``models/lthm/sequence/query_tower.py:14-138``.
    """

    config: LTHMModelConfig
    # mesh for sequence-parallel (ring) attention (config.transformer_config
    # .sequence_parallel); the stack shards activations over mesh['model']
    mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        inp: jnp.ndarray,       # (B, S, out_emb_dim) left-padded
        target: jnp.ndarray,    # (B, S, product_emb_dim)
        mask: jnp.ndarray,      # (B, S) bool, True = pad/invalid
        labels: jnp.ndarray,    # (B, S) int
        timestamp: jnp.ndarray, # (B, S) int64 epoch seconds
        ids: jnp.ndarray,       # (B, S) int64
        future_outcome: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        tcfg = cfg.transformer_config
        acfg = tcfg.attn_config
        emb_dim = cfg.emb_dim
        dtype = jnp.dtype(cfg.compute_dtype)
        bsz, orig_s = mask.shape

        # static trim to the most recent context_width events
        cw = min(cfg.context_width, orig_s)
        inp, target = inp[:, -cw:], target[:, -cw:]
        mask, ids = mask[:, -cw:], ids[:, -cw:]
        labels = labels[:, -cw:].astype(jnp.int64)
        timestamp = timestamp[:, -cw:].astype(jnp.int64)

        emb_action = FlatEmbedding(
            4, emb_dim, compute_dtype=dtype, name="action_embedding"
        )(labels)
        emb_hod = PatternFromTimelocal(
            3600, 24, emb_dim, compute_dtype=dtype, name="time_hod"
        )(timestamp)
        emb_how = PatternFromTimelocal(
            3600, 24 * 7, emb_dim, compute_dtype=dtype, name="time_how"
        )(timestamp)
        emb_dow = PatternFromTimelocal(
            86400, 7, emb_dim, compute_dtype=dtype, name="time_dow"
        )(timestamp)

        x = (
            nn.Dense(emb_dim, dtype=dtype, name="inp_proj")(inp.astype(dtype))
            + emb_action + emb_hod + emb_how + emb_dow
        ).astype(dtype)

        pad = self.param(
            "pad",
            nn.initializers.normal(stddev=1.0 / math.sqrt(emb_dim)),
            (1, 1, emb_dim),
        )
        x = jnp.where(mask[..., None], pad.astype(x.dtype), x)

        # CLS column + reverse positional ids (most recent event = position 0)
        x = jnp.concatenate([jnp.zeros((bsz, 1, emb_dim), x.dtype), x], axis=1)
        pos = cw - jnp.arange(cw + 1)
        wpe = nn.Embed(cfg.context_width + 1, emb_dim, name="wpe")
        x = x + wpe(pos)[None]

        stack = TransformerStack(
            num_layers=tcfg.num_layers,
            n_embd=emb_dim,
            n_head=acfg.n_head,
            attn_type=acfg.attn_type,
            is_causal=tcfg.is_causal,
            use_bias=acfg.bias,
            dropout=acfg.dropout,
            attn_dropout=acfg.attn_dropout,
            pos_bias_window=(acfg.pos_bias.context_window if acfg.pos_bias else None),
            rotator=tcfg.rotator(),
            is_sparse_attn=tcfg.is_sparse_attn,
            max_block_size=tcfg.max_block_size,
            sparsity_factor=tcfg.sparsity_factor,
            n_cls=1,
            use_flash=tcfg.use_flash_attention,
            use_ring=tcfg.sequence_parallel,
            mesh=self.mesh if tcfg.sequence_parallel else None,
            remat=tcfg.enable_gradient_checkpointing,
            remat_policy=tcfg.remat_policy,
            dtype=dtype,
            name="transformer",
        )
        x = stack(x, deterministic=deterministic)

        # outcome conditioning over (labels ++ future_outcome) — (B, S+1)
        if future_outcome is None:
            future_outcome = jnp.zeros((bsz, 1), dtype=jnp.int64)
        outcomes = jnp.concatenate(
            [labels, jnp.broadcast_to(future_outcome.astype(jnp.int64), (bsz, 1))], axis=-1
        )
        x = x + FlatEmbedding(
            4, emb_dim, compute_dtype=dtype, name="outcome_conditioning"
        )(outcomes)

        # one linear head per lookahead horizon → (B, S+1, K, D_prod).
        # All K heads share the input, so they run as ONE (emb_dim, K*D)
        # matmul instead of K skinny dispatches (reference stacks separate
        # Linears, query_tower.py:117-123); output f32 for the loss.
        x = x.astype(dtype)
        d_prod = cfg.product_tower.product_emb_dim
        y = nn.Dense(
            cfg.export_tokens * d_prod, use_bias=False, dtype=dtype,
            name="emb_heads",
        )(x).astype(jnp.float32)
        y = y.reshape(bsz, y.shape[1], cfg.export_tokens, d_prod)

        return {
            "current_token_emb": target,
            "next_token_emb": y,
            "current_token_mask": mask,
            "current_token_ids": ids,
        }


class LTHMEncoder(nn.Module):  # noqa: D101  (docstring below)
    """Full LTHM forward: product embeddings → towers.

    Reference ``models/lthm/sequence/encoder.py:19-61``.  The product
    embedding module is either a fresh KShift table (dim = ``inp_emb_dim``;
    the reference constructs it with ``out_emb_dim``, which cannot feed its
    own ``emb_mapper`` — fixed per intent) or a pretrained compressed module
    loaded into the frozen ``constants`` collection (see
    ``tools/embedding_module_gen.py``).
    """

    config: LTHMModelConfig
    ids_key: str = "product_ids"
    labels_key: str = "labels"
    timestamp_key: str = "timestamps"
    # mesh for row-sharded product-embedding tables (config.shard_embedding_rows)
    mesh: Optional[object] = None

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        deterministic: bool = True,
        taps: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        tc = cfg.product_tower
        ids = batch[self.ids_key]

        if tc.model_init_metadata is not None:
            from recommendations_tpu.models.lthm.pretrained import (
                PretrainedProductEmbedding,
            )

            embs = PretrainedProductEmbedding(
                num_embeddings=tc.latent_model_config.vocab_size_latent,
                features=tc.inp_emb_dim,
                num_shifts=tc.latent_model_config.num_shifts_latent,
                normalize_output=tc.latent_model_config.normalize_embedding,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
                name="product_emb_module",
            )(ids)
        elif cfg.shard_embedding_rows and self.mesh is not None:
            from recommendations_tpu.parallel.sharded_embedding import (
                ShardedKShiftEmbedding,
            )

            embs = ShardedKShiftEmbedding(
                num_embeddings=tc.latent_model_config.vocab_size_latent,
                features=tc.inp_emb_dim,
                num_shifts=tc.latent_model_config.num_shifts_latent,
                normalize_output=tc.latent_model_config.normalize_embedding,
                mesh=self.mesh,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
                schedule=cfg.embedding_lookup_schedule,
                name="product_emb_module",
            )(ids)
        else:
            embs = KShiftEmbedding(
                num_embeddings=tc.latent_model_config.vocab_size_latent,
                features=tc.inp_emb_dim,
                num_shifts=tc.latent_model_config.num_shifts_latent,
                normalize_output=tc.latent_model_config.normalize_embedding,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
                fused_record=cfg.uses_fused_table(),
                name="product_emb_module",
            )(ids, tap=(taps or {}).get("product_emb_rows"))

        inp, target, mask = ProductTower(cfg, name="product_tower")(ids, embs)

        # flip to left padding (history arrives most-recent-first,
        # right-padded; reference encoder.py:52-61)
        labels = batch[self.labels_key].astype(jnp.int64)
        timestamp = batch[self.timestamp_key].astype(jnp.int64)
        inp, target, mask, labels, timestamp, ids = (
            jnp.flip(t, axis=1) for t in (inp, target, mask, labels, timestamp, ids)
        )

        return QueryTower(cfg, mesh=self.mesh, name="query_tower")(
            inp, target, mask, labels, timestamp, ids, deterministic=deterministic
        )
