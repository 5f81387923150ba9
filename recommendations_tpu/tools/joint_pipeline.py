"""Joint retrieval → ranking pipeline (BASELINE config 4).

The production topology the reference gestures at but never assembles: the
trained LTHM encoder produces a user embedding from interaction history, and
the ranker consumes it as a dense feature next to its tabular inputs.

Steps:
1. load (or train) an LTHM checkpoint;
2. encode each user's history → the lookahead-0 query embedding at the most
   recent position (the 'user vector' used for retrieval);
3. join the user vectors onto the impression log as a ``tensor`` feature;
4. train the ranker with ``user_emb`` routed to its user tower.

Everything runs on-device; the join is a host-side hash map.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from recommendations_tpu.nn.functional import l2_normalize

logger = logging.getLogger(__name__)


def encode_users(
    wrapper,
    variables,
    user_batches,
    id_field: str = "customer_id",
) -> Dict[str, np.ndarray]:
    """customer_id (raw string) → L2-normalized user embedding."""

    @jax.jit
    def _encode(batch):
        out = wrapper.forward(variables, batch, deterministic=True)
        q = out["next_token_emb"][:, -1, 0, :]  # most-recent position, head 0
        return l2_normalize(q)

    table: Dict[str, np.ndarray] = {}
    for batch in user_batches:
        ids = batch[id_field]
        dev = {k: jnp.asarray(v) for k, v in batch.items() if v.dtype != object}
        emb = np.asarray(_encode(dev))
        for i, uid in enumerate(ids):
            table[str(uid)] = emb[i]
    return table


def attach_user_embeddings(
    impressions: pd.DataFrame,
    user_table: Dict[str, np.ndarray],
    emb_dim: int,
    id_column: str = "customer_id",
    out_column: str = "user_emb",
) -> pd.DataFrame:
    """Join user vectors onto the impression log (cold users get zeros)."""
    zero = np.zeros(emb_dim, np.float32)
    out = impressions.copy()
    out[out_column] = [
        user_table.get(str(u), zero) for u in impressions[id_column].values
    ]
    return out


def run_joint(
    lthm_wrapper,
    lthm_variables,
    user_batches,
    impressions: pd.DataFrame,
    ranker_config,
    train_steps: int = 200,
    batch_size: int = 256,
    seed: int = 0,
):
    """Train the ranker on impressions enriched with LTHM user embeddings.

    Returns (ranker_wrapper, ranker_params, final_metrics).
    """
    import optax

    from recommendations_tpu.models.ranker.wrapper import RankerModelWrapper

    emb_dim = lthm_wrapper.config.product_tower.product_emb_dim
    user_table = encode_users(lthm_wrapper, lthm_variables, user_batches)
    logger.info("encoded %d users", len(user_table))
    enriched = attach_user_embeddings(impressions, user_table, emb_dim)

    wrapper = RankerModelWrapper(ranker_config)
    feats = ranker_config.features
    mapped = feats.default_data_mapper(enriched)

    def make_batch(rs):
        idx = rs.randint(0, len(mapped), batch_size)
        sl = mapped.iloc[idx]
        from recommendations_tpu.data.grouping import make_features_compliant

        host = make_features_compliant(dict(sl), feats)
        return {
            k: jnp.asarray(v)
            for k, v in host.items()
            if getattr(v, "dtype", None) is not None and v.dtype.kind in "ifub"
        }

    rs = np.random.RandomState(seed)
    batch = make_batch(rs)
    vs = wrapper.init_variables(jax.random.PRNGKey(seed), batch)
    params = vs["params"]
    consts = vs.get("constants", {})
    tx = optax.adam(ranker_config.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, b, rng):
        def lf(p):
            loss, (m, _) = wrapper.loss_and_metrics(p, consts, None, b, rng, True)
            return loss, m

        (loss, m), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, o2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), o2, loss, m

    rng = jax.random.PRNGKey(seed + 1)
    metrics = {}
    for i in range(train_steps):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss, metrics = step(params, opt_state, make_batch(rs), sub)
    return wrapper, params, {k: float(v) for k, v in metrics.items()}
