"""Offline compressor: reconstruction quality + artifact round-trip into the
frozen pretrained module."""

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest

from recommendations_tpu.tools.embedding_module_gen import (
    massage_embeddings,
    train_reconstruction,
    train_mask_model,
    save_artifact,
    load_artifact,
)


def _toy_embeddings(n=300, dim=8, seed=0):
    rs = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "product_id": [f"sku_{i}" for i in range(n)],
            "emb_128": [rs.randn(128).astype(np.float32) for _ in range(n)],
        }
    )


def test_massage_hashing_contract():
    df = _toy_embeddings(10)
    ids, embs = massage_embeddings(df, dim=8)
    assert ids.dtype == np.int64
    assert embs.shape == (10, 8)
    from recommendations_tpu.features.hashing import (
        hash_feature_name_to_int,
        hash_string_to_long,
    )

    seed = hash_feature_name_to_int("product_id")
    assert ids[3] == hash_string_to_long("sku_3", seed, False)


def test_reconstruction_learns():
    df = _toy_embeddings(200, dim=8)
    ids, embs = massage_embeddings(df, dim=8)
    art = train_reconstruction(
        ids, embs, expansion_factor=4.0, k_shift=8, num_epochs=100, batch_size=200, lr=0.5
    )
    # reconstruction cosine similarity must be high with 4x expansion
    from recommendations_tpu.nn.embeddings import KShiftEmbedding

    model = KShiftEmbedding(
        num_embeddings=int(4.0 * 200), features=8, num_shifts=8, normalize_output=True
    )
    pred = np.asarray(
        model.apply({"params": {"embedding": jnp.asarray(art["emb_table"])}}, jnp.asarray(ids))
    )
    target = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
    cos = (pred * target).sum(-1)
    assert cos.mean() > 0.9, f"mean cosine {cos.mean()}"


def test_mask_model_separates_known_from_random():
    df = _toy_embeddings(256)
    ids, _ = massage_embeddings(df, dim=8)
    params = train_mask_model(ids, expansion_factor=4.0, num_epochs=30, batch_size=256)
    from recommendations_tpu.nn.embeddings import kshift_row_indices
    from recommendations_tpu.nn.functional import quick_gelu

    def score(x):
        idx = kshift_row_indices(jnp.asarray(x), int(4.0 * 256), 4)
        m = jnp.take(jnp.asarray(params["mask_table"]), idx.astype(jnp.int32), axis=0).sum(-2) / 2.0
        h = quick_gelu(m @ params["mask_w1"] + params["mask_b1"])
        return np.asarray(jax.nn.sigmoid((h @ params["mask_w2"] + params["mask_b2"])[..., 0]))

    rs = np.random.RandomState(9)
    rand_ids = rs.randint(-(2**63), 2**63 - 1, size=256, dtype=np.int64)
    assert score(ids).mean() > 0.7
    assert score(rand_ids).mean() < 0.4


def test_artifact_roundtrip_into_pretrained_module(tmp_path):
    df = _toy_embeddings(64)
    ids, embs = massage_embeddings(df, dim=8)
    art = train_reconstruction(ids, embs, 2.0, 4, num_epochs=5, batch_size=64)
    art.update(train_mask_model(ids, 2.0, num_epochs=2, batch_size=64))
    save_artifact(art, str(tmp_path), {"dim": 8})
    loaded = load_artifact(str(tmp_path))
    np.testing.assert_array_equal(loaded["emb_table"], art["emb_table"])

    # splice into the frozen module
    from recommendations_tpu.models.lthm.pretrained import (
        PretrainedProductEmbedding,
        load_pretrained_constants,
    )

    mod = PretrainedProductEmbedding(
        num_embeddings=int(2.0 * 64), features=8, num_shifts=4, normalize_output=True
    )
    vs = mod.init(jax.random.PRNGKey(0), jnp.asarray(ids[:4]))
    vs2 = load_pretrained_constants(
        {"constants": {"product_emb_module": vs["constants"]}},
        loaded,
    )
    out = mod.apply(
        {"constants": vs2["constants"]["product_emb_module"]}, jnp.asarray(ids[:4])
    )
    assert np.isfinite(np.asarray(out)).all()
    # gate should be near 1 for known ids -> norms close to 1 (normalized emb)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    assert (norms > 0.3).all()
