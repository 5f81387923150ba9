"""Feature-system golden tests: hashing semantics vs reference
``commons/feature_utils.py`` contracts (SURVEY.md §4 'unit')."""

import numpy as np
import pandas as pd
import xxhash

from recommendations_tpu.features import (
    FeaturesConfig,
    hash_feature_name_to_int,
    hash_string_to_long,
    MAX_LONG_VALUE_PLUS_ONE,
)
from recommendations_tpu.features import transforms
from recommendations_tpu.features.hashing import hash_strings_to_long


def test_hash_feature_name_seed():
    # seed = xxh32(lowercased name, 0) — reference feature_utils.py:36-37
    assert hash_feature_name_to_int("Product_ID") == xxhash.xxh32("product_id", 0).intdigest()


def test_hash_string_to_long_range_and_value():
    seed = hash_feature_name_to_int("product_id")
    v = hash_string_to_long("SKU123", seed, value_to_lower=False)
    assert -(2**63) <= v < 2**63
    assert v == xxhash.xxh64("SKU123", seed).intdigest() - MAX_LONG_VALUE_PLUS_ONE
    # lowercase variant hashes the lowercased string
    assert hash_string_to_long("SKU123", seed, True) == hash_string_to_long("sku123", seed, False)


def test_hash_strings_vectorized_matches_scalar():
    seed = 42
    vals = ["a", "B", "longer_string", "123"]
    got = hash_strings_to_long(vals, seed, value_to_lower=True)
    want = np.array([hash_string_to_long(v, seed, True) for v in vals])
    np.testing.assert_array_equal(got, want)


def test_pad_array():
    out = transforms.pad_array([5, 6, 7], size=5)
    np.testing.assert_array_equal(out, [5, 6, 7, 0, 0])
    out = transforms.pad_array([5, 6, 7], size=2)
    np.testing.assert_array_equal(out, [5, 6])


def test_one_hot_string_indices():
    df = pd.DataFrame({"apps": ["0101", None]})
    transforms.fix_na_one_hot_string(df, "apps")
    transforms.create_array_one_hot_feature(df, "apps")
    row0 = df["apps"].iloc[0]
    assert row0[0] == 1 and row0[1] == 3 and row0[2] == -1
    assert len(row0) == 100
    assert (df["apps"].iloc[1] == -1).all()


def test_history_hash_and_leak_removal():
    """History ids hashed with the *current item* feature's seed; the current
    id removed; capped/padded (reference feature_utils.py:149-179)."""
    seed = hash_feature_name_to_int("product_id")
    cur = hash_string_to_long("B", seed, False)
    df = pd.DataFrame(
        {"product_id": [cur], "hist": [["A", "B", "C", "D"]]}
    )
    transforms.handle_categorical_history_feature(
        df, "hist", hash_ids=True, history_length=3,
        history_id_feature_name="product_id", remove_history_id_from_history=True,
    )
    got = df["hist"].iloc[0]
    want = [hash_string_to_long(s, seed, False) for s in ["A", "C", "D"]]
    np.testing.assert_array_equal(got, want)


def _lthm_like_features():
    return FeaturesConfig(
        defaults={
            "categorical_features": {
                "default_dtype": "string",
                "transform_value_to_lowercase": False,
                "value_to_number_mapper": {"kind": "xxhash"},
            },
            "categorical_history_features": {"default_dtype": "string_list"},
        },
        categorical_features=[{"name": "product_id", "kind": "categorical"}],
        categorical_history_features=[
            {
                "name": "product_ids",
                "kind": "categorical_history",
                "history_length": 4,
                "history_id_feature_name": "product_id",
                "value_to_number_mapper": {"kind": "xxhash"},
            }
        ],
        tensor_list_features=[
            {"name": "labels", "kind": "tensor_list", "shape": (4,)},
        ],
        group_dataset={"group_by_columns": ["user"], "sort_by_columns": ["t"]},
    )


def test_features_config_compiles_and_maps():
    cfg = _lthm_like_features()
    assert set(cfg.input_columns) == {"product_id", "product_ids", "labels"}
    df = pd.DataFrame(
        {
            "product_id": ["X", None],
            "product_ids": [["A", "B"], ["C"]],
            "labels": [np.ones(4, np.float32), None],
        }
    )
    out = cfg.default_data_mapper(df)
    seed = hash_feature_name_to_int("product_id")
    assert out["product_id"].iloc[0] == hash_string_to_long("X", seed, False)
    hist = out["product_ids"].iloc[0]
    np.testing.assert_array_equal(
        hist,
        [hash_string_to_long("A", seed, False), hash_string_to_long("B", seed, False), 0, 0],
    )
    # NA tensor_list becomes zeros of the declared shape
    np.testing.assert_array_equal(out["labels"].iloc[1], np.zeros(4))


def test_features_config_dtype_conflict_raises():
    import pytest

    with pytest.raises(ValueError):
        FeaturesConfig(
            defaults={},
            numerical_features=[{"name": "x", "kind": "numerical"}],
            timestamp_features=[
                {"name": "x2", "kind": "timestamp", "source": {"kind": "input", "input_field": "x"}}
            ],
        )


def test_feature_name_lowercasing():
    cfg = FeaturesConfig(
        defaults={"transform_all_feature_names_to_lowercase": True},
        numerical_features=[{"name": "Price", "kind": "numerical"}],
    )
    assert "price" in cfg.features_map
    # rename transformer maps the original input column to the lowercased name
    df = pd.DataFrame({"Price": [1.0, None]})
    out = cfg.default_data_mapper(df)
    assert "price" in out.columns
    assert out["price"].iloc[1] == -1.0  # NA_NUMERICAL_VALUE fill
