"""Ranker (FDLRM) tests: tower routing, AUC metric oracle, learning signal."""

import jax
import jax.numpy as jnp
import numpy as np

from recommendations_tpu.models.ranker.config import RankerModelConfig
from recommendations_tpu.models.ranker.metrics import binary_auc, ndcg_at_k
from recommendations_tpu.models.ranker.wrapper import RankerModelWrapper
from recommendations_tpu.features.hashing import hash_feature_name_to_int, hash_string_to_long
from recommendations_tpu.tools.synth_data import make_ranking_log


def ranker_config(**over):
    base = dict(
        emb_dim=16,
        tower_hidden=(32,),
        tower_dim=16,
        top_hidden=(32,),
        num_embeddings_default=10007,
        tasks=[
            {"name": "click", "kind": "numerical", "num_labels": 1, "weight": 1.0},
        ],
        features={
            "defaults": {
                "categorical_features": {
                    "default_dtype": "string",
                    "transform_value_to_lowercase": False,
                    "value_to_number_mapper": {"kind": "xxhash"},
                }
            },
            "categorical_features": [
                {"name": "product_id", "kind": "categorical", "tower_name": "product"},
                {"name": "customer_id", "kind": "categorical", "tower_name": "user"},
                {"name": "search_query", "kind": "categorical", "tower_name": "query"},
            ],
            "numerical_features": [
                {"name": "price", "kind": "numerical", "tower_name": "product"},
                {"name": "position", "kind": "numerical", "tower_name": "query"},
                {"name": "click", "kind": "numerical", "tower_name": "other"},
            ],
            "bool_features": [
                {"name": "is_returning_user", "kind": "bool", "tower_name": "user"},
            ],
            "timestamp_features": [
                {"name": "event_ts", "kind": "timestamp", "tower_name": "query"},
            ],
        },
    )
    base.update(over)
    return RankerModelConfig(**base)


def hashed_batch(n=64, seed=0):
    df = make_ranking_log(num_rows=n, seed=seed)
    cfg_feats_seed = {
        c: hash_feature_name_to_int(c) for c in ("product_id", "customer_id", "search_query")
    }
    batch = {}
    for c, s in cfg_feats_seed.items():
        batch[c] = jnp.asarray(
            np.array([hash_string_to_long(v, s, False) for v in df[c]], dtype=np.int64)
        )
    for c in ("price", "position", "is_returning_user", "click", "conversion"):
        batch[c] = jnp.asarray(df[c].values.astype(np.float32))
    batch["event_ts"] = jnp.asarray(df["event_ts"].values.astype(np.int64))
    return batch


def test_tower_routing():
    cfg = ranker_config()
    assert cfg.product_features_list == ["product_id", "price"]
    assert cfg.query_features_list == ["search_query", "position", "event_ts"]
    assert cfg.user_features_list == ["customer_id", "is_returning_user"]


def test_forward_and_loss_shapes():
    cfg = ranker_config()
    wrapper = RankerModelWrapper(cfg)
    batch = hashed_batch(32)
    vs = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    out = wrapper.forward(vs, batch)
    assert out["click"].shape == (32, 1)
    loss, (metrics, _) = wrapper.loss_and_metrics(
        vs["params"], vs.get("constants", {}), None, batch, jax.random.PRNGKey(1), True
    )
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["train_auc_click"]) <= 1.0


def test_binary_auc_oracle():
    scores = jnp.asarray([0.9, 0.8, 0.3, 0.1])
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    # pairs: (0.9>0.8 ok) (0.9>0.1 ok) (0.3<0.8 bad) (0.3>0.1 ok) -> 3/4
    assert abs(float(binary_auc(scores, labels)) - 0.75) < 1e-6
    # degenerate single-class -> 0.5
    assert float(binary_auc(scores, jnp.ones(4))) == 0.5


def test_ndcg_oracle():
    scores = jnp.asarray([[3.0, 2.0, 1.0]])
    rel = jnp.asarray([[1.0, 0.0, 1.0]])
    got = float(ndcg_at_k(scores, rel, k=3))
    dcg = 1.0 / np.log2(2) + 1.0 / np.log2(4)
    idcg = 1.0 / np.log2(2) + 1.0 / np.log2(3)
    assert abs(got - dcg / idcg) < 1e-5


def test_ranker_learns_signal():
    """A few hundred steps on the synthetic log must push train AUC above
    0.6 (BASELINE config 2 sanity)."""
    import optax

    cfg = ranker_config()
    wrapper = RankerModelWrapper(cfg)
    batch = hashed_batch(256, seed=1)
    vs = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    params = vs["params"]
    consts = vs.get("constants", {})
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, b, rng):
        def lf(p):
            loss, (m, _) = wrapper.loss_and_metrics(p, consts, None, b, rng, True)
            return loss, m

        (loss, m), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, o2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), o2, loss, m

    rng = jax.random.PRNGKey(2)
    for i in range(120):
        rng, sub = jax.random.split(rng)
        b = hashed_batch(256, seed=i % 4)  # cycle 4 batches
        params, opt_state, loss, m = step(params, opt_state, b, sub)
    auc = float(m["train_auc_click"])
    assert auc > 0.6, f"ranker failed to learn: auc={auc}"
