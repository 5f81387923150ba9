"""Offline KNN retrieval evaluation: recall@k over the product catalog.

The reference *configures* this (``trainer_config.py:79-81``:
``knn_top_k_list=[1,5,10,20,100,200]``) but its ``eval_model`` body is
``pass``.  This implements the intent:

1. Encode the product catalog: ids → product-tower retrieval embeddings
   (the 'current_token_emb' space).
2. Encode held-out users: history → the next-token (lookahead-0) query
   embedding at the last real position.
3. Brute-force top-k by dot product on device (one (Q, N_catalog) matmul on
   the MXU per query batch — at catalog sizes up to ~10M x 128 this is a
   single-digit-ms matmul per batch, no ANN index needed on TPU).
4. recall@k: the user's actual next item is in the top-k.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from recommendations_tpu.nn.functional import l2_normalize

logger = logging.getLogger(__name__)


def encode_catalog(
    wrapper, variables, product_ids: np.ndarray, batch_size: int = 8192
) -> jnp.ndarray:
    """ids (N,) int64 → L2-normalized retrieval embeddings (N, D)."""

    import flax.linen as nn

    from recommendations_tpu.models.lthm.model import ProductTower
    from recommendations_tpu.nn.embeddings import KShiftEmbedding

    cfg = wrapper.config
    tc = cfg.product_tower

    class _ProductEncoder(nn.Module):
        """Standalone product path reusing the trained submodule names, so the
        wrapper's variables re-root directly onto it."""

        @nn.compact
        def __call__(self, ids):
            embs = KShiftEmbedding(
                num_embeddings=tc.latent_model_config.vocab_size_latent,
                features=tc.inp_emb_dim,
                num_shifts=tc.latent_model_config.num_shifts_latent,
                normalize_output=tc.latent_model_config.normalize_embedding,
                name="product_emb_module",
            )(ids)
            _, prod_emb, _ = ProductTower(cfg, name="product_tower")(ids, embs)
            return prod_emb

    encoder = _ProductEncoder()
    sub_vars: Dict[str, dict] = {}
    for coll in ("params", "constants"):
        if coll in variables:
            sub = {
                k: v
                for k, v in variables[coll].items()
                if k in ("product_emb_module", "product_tower")
            }
            if sub:
                sub_vars[coll] = sub

    @jax.jit
    def _encode(ids):
        return l2_normalize(encoder.apply(sub_vars, ids))

    out = []
    n = len(product_ids)
    for i in range(0, n, batch_size):
        chunk = product_ids[i : i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.pad(chunk, (0, pad))
        emb = _encode(jnp.asarray(chunk))
        out.append(np.asarray(emb)[: batch_size - pad])
    return jnp.asarray(np.concatenate(out, axis=0))


def knn_recall(
    wrapper,
    variables,
    user_batches: List[Dict[str, np.ndarray]],
    catalog_ids: np.ndarray,
    top_k_list: List[int],
) -> pd.DataFrame:
    """recall@k for 'held-out last item' retrieval.

    Each user batch must contain the standard LTHM inputs; the LAST real
    history event is held out as the label and the model queries with the
    remaining prefix.
    """
    catalog_emb = encode_catalog(wrapper, variables, catalog_ids)  # (N, D)
    cat_ids = jnp.asarray(catalog_ids)

    @jax.jit
    def _query(batch):
        out = wrapper.forward(variables, batch, deterministic=True)
        q = out["next_token_emb"][:, :, 0, :]  # lookahead-0 head (B, S+1, D)
        mask = out["current_token_mask"]  # (B, S)
        # last real position per row (left-padded): S - 1 is most recent;
        # query from the position BEFORE it → predicts the held-out last item
        s = mask.shape[1]
        real = (~mask).astype(jnp.int32)
        count = real.sum(axis=1)
        q_pos = jnp.clip(s - 1, 0, s)  # output index s-1 sees tokens < s-1
        qe = l2_normalize(q[:, q_pos, :])
        label = out["current_token_ids"][:, s - 1]
        scores = qe @ catalog_emb.T  # (B, N)
        return scores, label, count

    max_k = max(top_k_list)
    hits = {k: 0 for k in top_k_list}
    total = 0
    for batch in user_batches:
        scores, label, count = _query(
            {k: jnp.asarray(v) for k, v in batch.items() if v.dtype != object}
        )
        top_idx = jax.lax.top_k(scores, max_k)[1]  # (B, max_k)
        top_ids = jnp.take(cat_ids, top_idx)
        valid = np.asarray(count) >= 2
        lab = np.asarray(label)
        ti = np.asarray(top_ids)
        for k in top_k_list:
            hits[k] += int(((ti[:, :k] == lab[:, None]).any(axis=1) & valid).sum())
        total += int(valid.sum())

    rows = [
        {"k": k, "recall": hits[k] / max(total, 1), "queries": total}
        for k in top_k_list
    ]
    return pd.DataFrame(rows)


def run_knn_eval(wrapper, state, pipeline_config) -> Optional[pd.DataFrame]:
    """Pipeline hook: sample catalog + queries from the val paths."""
    from recommendations_tpu.data.generator import get_data_loader_strategy
    from recommendations_tpu.data.loader import get_host_dataloader
    from recommendations_tpu.data.paths import get_val_data_paths

    cfg = pipeline_config
    if cfg.eval is None or cfg.eval.skip_knn_eval:
        return None
    feats = cfg.model.features
    strategy = get_data_loader_strategy(
        cfg.data_loader, feats.get_input_columns(),
        lambda kind: feats.default_data_mapper,
    )
    val_paths = get_val_data_paths(cfg.dataset)
    if not val_paths:
        return None
    loader = get_host_dataloader(
        kind="val", worker_id=0, paths=val_paths,
        batch_size=cfg.eval.eval_batch_size,
        num_steps=cfg.eval.max_eval_steps,
        data_loader_strategy=strategy, features_config=feats,
        fs_config=cfg.dataset.filesystem_config,
    )
    batches = list(loader)
    if not batches:
        return None
    # catalog = distinct hashed ids seen in the eval stream
    ids_key = cfg.model.features.categorical_history_features[0].name
    all_ids = np.unique(np.concatenate([b[ids_key].reshape(-1) for b in batches]))
    all_ids = all_ids[all_ids != 0]
    variables = {"params": jax.device_get(state.params)}
    if state.constants:
        variables["constants"] = jax.device_get(state.constants)
    df = knn_recall(
        wrapper, variables, batches, all_ids, cfg.eval.knn_top_k_list
    )
    logger.info("knn eval:\n%s", df)
    return df
