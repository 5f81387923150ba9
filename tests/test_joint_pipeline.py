"""Joint LTHM→ranker integration (BASELINE config 4): user embeddings flow
from the retrieval encoder into the ranker's user tower."""

import jax
import numpy as np
import pandas as pd

from recommendations_tpu.models.ranker.config import RankerModelConfig
from recommendations_tpu.tools.joint_pipeline import (
    attach_user_embeddings,
    encode_users,
    run_joint,
)
from recommendations_tpu.tools.synth_data import make_ranking_log
from tests.test_lthm_model import synth_batch, tiny_config
from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper


def _user_batches(n_users=8, s=16):
    b = synth_batch(b=n_users, s=s)
    host = {k: np.asarray(v) for k, v in b.items()}
    host["customer_id"] = np.asarray([f"user_{i}" for i in range(n_users)], dtype=object)
    return [host]


def _joint_ranker_config(emb_dim):
    return RankerModelConfig(
        emb_dim=16,
        tower_hidden=(32,),
        tower_dim=16,
        top_hidden=(32,),
        num_embeddings_default=10007,
        lr=3e-3,
        tasks=[{"name": "click", "kind": "numerical", "num_labels": 1, "weight": 1.0}],
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
            ],
            "numerical_features": [
                {"name": "price", "kind": "numerical", "tower_name": "product"},
                {"name": "click", "kind": "numerical", "tower_name": "other"},
            ],
            "tensor_features": [
                {"name": "user_emb", "kind": "tensor", "emb_dim": emb_dim,
                 "tower_name": "user"},
            ],
        },
    )


def test_encode_and_attach():
    cfg = tiny_config()
    wrapper = LTHMModelWrapper(cfg)
    batches = _user_batches()
    vs = wrapper.init_variables(jax.random.PRNGKey(0), {
        k: v for k, v in batches[0].items() if v.dtype != object
    })
    table = encode_users(wrapper, vs, batches)
    assert len(table) == 8
    emb_dim = cfg.product_tower.product_emb_dim
    assert table["user_0"].shape == (emb_dim,)
    np.testing.assert_allclose(np.linalg.norm(table["user_0"]), 1.0, rtol=1e-4)

    imp = make_ranking_log(num_rows=32, num_users=16)
    joined = attach_user_embeddings(imp, table, emb_dim)
    known = joined[joined["customer_id"] == "user_0"]["user_emb"]
    if len(known):
        np.testing.assert_allclose(known.iloc[0], table["user_0"])
    cold = joined[~joined["customer_id"].isin(table)]["user_emb"]
    if len(cold):
        assert np.abs(cold.iloc[0]).max() == 0.0


def test_run_joint_trains_with_user_embeddings():
    """Ranker with a user_emb tensor feature trains to a finite loss and
    routes the feature to the user tower."""
    cfg = tiny_config()
    lthm = LTHMModelWrapper(cfg)
    batches = _user_batches(n_users=16)
    vs = lthm.init_variables(jax.random.PRNGKey(0), {
        k: v for k, v in batches[0].items() if v.dtype != object
    })
    rcfg = _joint_ranker_config(cfg.product_tower.product_emb_dim)
    assert rcfg.user_features_list == ["user_emb"]
    imp = make_ranking_log(num_rows=512, num_users=16)
    wrapper, params, metrics = run_joint(
        lthm, vs, batches, imp, rcfg, train_steps=30, batch_size=64
    )
    assert np.isfinite(metrics["train_loss"])
    assert 0.0 <= metrics["train_auc_click"] <= 1.0
    # the user tower consumed the embedding feature
    assert "user_tower" in params
    assert "enc_user_emb" in params["user_tower"]
