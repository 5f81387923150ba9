"""KNN retrieval eval: chunked-catalog scoring parity + true-catalog loading
(VERDICT round-1 #9 hardening)."""

import jax
import numpy as np
import pandas as pd

from recommendations_tpu.pipeline.knn_eval import knn_recall, _load_catalog_ids


def _tiny_wrapper():
    from recommendations_tpu.models.lthm.config import (
        LTHMModelConfig,
        LogQConfig,
        ProductTowerConfig,
        SelfAttentionConfig,
        TransformerConfig,
    )
    from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper

    cfg = LTHMModelConfig(
        features={"defaults": {}},
        transformer_config=TransformerConfig(
            rotator_config={"ff_mult": 2},
            is_causal=True,
            num_layers=1,
            attn_config=SelfAttentionConfig(
                n_head=2, n_embd=32, attn_type="multi_query",
                dropout=0.0, attn_dropout=0.0, bias=False,
            ),
        ),
        product_tower=ProductTowerConfig(
            inp_emb_dim=16, out_emb_dim=32, product_emb_dim=16, norm_bins=4,
            cosine_lsh_config=[{"num_bins": 4, "num_proj": 8}],
            latent_model_config={
                "vocab_size_latent": 1024, "num_shifts_latent": 4,
                "normalize_embedding": True,
            },
        ),
        log_q_config=LogQConfig(num_buckets=1024, hash_offsets=[0]),
        lookahead=[0],
        context_width=8,
        train_mini_batch_size=-1,
        compute_dtype="float32",
    )
    return LTHMModelWrapper(cfg)


def test_chunked_catalog_matches_single_shot():
    wrapper = _tiny_wrapper()
    rs = np.random.RandomState(0)
    b, s = 8, 10
    ids = rs.randint(-(2**62), 2**62, size=(b, s)).astype(np.int64)
    ids[:, -2:] = 0
    batch = {
        "product_ids": ids,
        "labels": rs.randint(0, 4, size=(b, s)).astype(np.float32),
        "timestamps": rs.randint(1_600_000_000, 1_700_000_000, size=(b, s)).astype(
            np.float32
        ),
    }
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    catalog = np.unique(
        np.concatenate([ids.reshape(-1), rs.randint(-(2**62), 2**62, 500)])
    ).astype(np.int64)
    catalog = catalog[catalog != 0]

    # chunk smaller than the catalog (forces the running top-k merge,
    # including a padded final chunk) vs one-shot
    df_chunked = knn_recall(
        wrapper, variables, [batch], catalog, [1, 5, 20], catalog_chunk_rows=100
    )
    df_single = knn_recall(
        wrapper, variables, [batch], catalog, [1, 5, 20],
        catalog_chunk_rows=len(catalog),
    )
    pd.testing.assert_frame_equal(df_chunked, df_single)
    assert (df_chunked["queries"] > 0).all()
    # monotone in k
    rec = df_chunked.sort_values("k")["recall"].to_numpy()
    assert (np.diff(rec) >= 0).all()


def test_load_catalog_ids_hashes_like_history_feature():
    from recommendations_tpu.config.pipeline_config import TrainerPipelineConfig
    from recommendations_tpu.data import FakeDataStore
    from recommendations_tpu.features.hashing import (
        hash_feature_name_to_int,
        hash_strings_to_long,
    )

    FakeDataStore.reset()
    FakeDataStore.put_table(
        "catalog/products.parquet",
        pd.DataFrame({"product_id": ["sku_1", "sku_2", "sku_2", "sku_3"]}),
    )

    class _Cfg:  # minimal duck-typed pipeline config
        class eval:
            knn_catalog_table_path = "catalog/products.parquet"
            knn_catalog_id_column = None

        class dataset:
            from recommendations_tpu.config.trainer_config import FileSystemConfig

            filesystem_config = FileSystemConfig(
                kind="fake", path_template="catalog"
            )

        class model:
            class features:
                class _F:
                    history_id_feature_name = "product_id"

                categorical_history_features = [_F()]

    ids = _load_catalog_ids(_Cfg)
    seed = hash_feature_name_to_int("product_id")
    want = np.unique(
        hash_strings_to_long(["sku_1", "sku_2", "sku_3"], seed, False)
    )
    np.testing.assert_array_equal(ids, want[want != 0])

    # already-hashed int64 column passes through
    FakeDataStore.put_table(
        "catalog/hashed.parquet",
        pd.DataFrame({"product_id": np.array([5, -9, 5, 0], dtype=np.int64)}),
    )
    _Cfg.eval.knn_catalog_table_path = "catalog/hashed.parquet"
    ids2 = _load_catalog_ids(_Cfg)
    np.testing.assert_array_equal(ids2, np.array([-9, 5], dtype=np.int64))


def _wrapper_with(seed_cfg_updates):
    """_tiny_wrapper variant with product-tower / top-level overrides."""
    from recommendations_tpu.models.lthm.config import LTHMModelConfig
    from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper

    base = _tiny_wrapper().config.model_dump()
    for k, v in seed_cfg_updates.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            base[k].update(v)
        else:
            base[k] = v
    return LTHMModelWrapper(LTHMModelConfig(**base))


def test_encode_catalog_sharded_config():
    """encode_catalog must dispatch like LTHMEncoder: under
    shard_embedding_rows the trained table is row-padded to the mesh, and a
    hard-coded dense KShift re-root breaks (VERDICT r2 weak #3)."""
    from recommendations_tpu.core.mesh import MeshConfig, build_mesh
    from recommendations_tpu.pipeline.knn_eval import encode_catalog

    mesh = build_mesh(MeshConfig(data=-1, model=4))
    # vocab NOT divisible by the 4-way model axis -> sharded table is padded
    wrapper = _wrapper_with(
        {"shard_embedding_rows": True,
         "product_tower": {"latent_model_config": {
             "vocab_size_latent": 1022, "num_shifts_latent": 4,
             "normalize_embedding": True}}}
    )
    wrapper.bind_mesh(mesh)
    rs = np.random.RandomState(0)
    ids = rs.randint(-(2**62), 2**62, size=(4, 8)).astype(np.int64)
    batch = {
        "product_ids": ids,
        "labels": rs.randint(0, 4, size=(4, 8)).astype(np.float32),
        "timestamps": rs.randint(1_600_000_000, 1_700_000_000, size=(4, 8)).astype(np.float32),
    }
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    catalog = rs.randint(-(2**62), 2**62, size=64).astype(np.int64)
    emb = encode_catalog(wrapper, variables, catalog, batch_size=32)
    assert emb.shape == (64, wrapper.config.product_tower.product_emb_dim)
    assert np.isfinite(emb).all()
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-4)


def test_encode_catalog_pretrained_config(tmp_path):
    """encode_catalog under model_init_metadata: the product embeddings live
    in the frozen 'constants' collection; the old dense-KShift re-root had no
    matching params and raised (silently swallowed by eval_model)."""
    import jax.numpy as jnp

    from recommendations_tpu.pipeline.knn_eval import encode_catalog
    from recommendations_tpu.tools.embedding_module_gen import (
        massage_embeddings,
        save_artifact,
        train_mask_model,
        train_reconstruction,
    )

    rs = np.random.RandomState(0)
    df = pd.DataFrame({
        "product_id": [f"p{i}" for i in range(64)],
        "emb_128": list(rs.randn(64, 16).astype(np.float32)),
    })
    ids, embs = massage_embeddings(df, dim=16)
    art = train_reconstruction(ids, embs, 2.0, 4, num_epochs=2, batch_size=64)
    art.update(train_mask_model(ids, 2.0, num_epochs=1, batch_size=64))
    save_artifact(art, str(tmp_path), {"dim": 16})

    wrapper = _wrapper_with(
        {"product_tower": {
            "model_init_metadata": {"embedding_module_path": str(tmp_path)},
            "latent_model_config": {
                "vocab_size_latent": int(2.0 * 64), "num_shifts_latent": 4,
                "normalize_embedding": True},
        }}
    )
    batch = {
        "product_ids": ids[:8].reshape(2, 4),
        "labels": rs.randint(0, 4, size=(2, 4)).astype(np.float32),
        "timestamps": rs.randint(1_600_000_000, 1_700_000_000, size=(2, 4)).astype(np.float32),
    }
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    assert "constants" in variables
    emb = encode_catalog(wrapper, variables, ids[:32], batch_size=16)
    assert emb.shape == (32, wrapper.config.product_tower.product_emb_dim)
    assert np.isfinite(emb).all()
