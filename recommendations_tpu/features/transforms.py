"""Host-side DataFrame transforms compiled by the feature system.

Behavioral parity with reference ``commons/feature_utils.py:49-183`` (NA
fixing per dtype, rename/copy, categorical hashing, one-hot-string index
extraction, lat-long boxing, history hashing/leak-removal/pad) — but
vectorized with NumPy where the reference loops row-by-row, because a pandas
``apply`` per row cannot feed a TPU pod (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd

from recommendations_tpu.features import constants as C
from recommendations_tpu.features.hashing import (
    hash_feature_name_to_int,
    hash_string_to_long,
    hash_strings_to_long,
)


def pad_array(arr, size: int, pad_token: int = C.CATEGORICAL_VAR_HASH_PAD_TOKEN) -> np.ndarray:
    """Truncate-then-right-pad to ``size`` (reference ``feature_utils.py:21-25``)."""
    arr = np.asarray(arr, dtype=np.int64).reshape(-1)[:size]
    t = max(0, size - len(arr))
    return np.pad(arr, (0, t), mode="constant", constant_values=pad_token)


# ----- NA fixing ------------------------------------------------------------


def fix_na_bool(batch: pd.DataFrame, column: str) -> None:
    batch[column] = batch[column].values.astype(np.float32)


def fix_na_str(batch: pd.DataFrame, column: str) -> None:
    batch[column] = batch[column].fillna("NA")


def fix_na_int64(batch: pd.DataFrame, column: str, value_to_lower: bool) -> None:
    seed = hash_feature_name_to_int(column)
    na_value = hash_string_to_long("NA", seed, value_to_lower=value_to_lower)
    vals = batch[column]
    batch[column] = vals.where(vals.notna(), other=na_value).astype(np.int64)


def fix_na_string_list(batch: pd.DataFrame, column: str) -> None:
    batch[column] = batch[column].apply(lambda x: [] if x is None else x)


def fix_na_one_hot_string(batch: pd.DataFrame, column: str) -> None:
    batch[column] = batch[column].apply(
        lambda x: C.ONE_HOT_STRING_DEFAULT if x is None else x
    )


def fix_na_tensor(batch: pd.DataFrame, column: str, emb_dim: int) -> None:
    sentinel = np.zeros(emb_dim)
    batch[column] = batch[column].apply(lambda x: sentinel if x is None else x)


def fix_na_tensor_list(batch: pd.DataFrame, column: str, shape: Tuple[int, ...]) -> None:
    sentinel = np.zeros((int(np.prod(shape)),), dtype=np.float32)
    batch[column] = batch[column].apply(
        lambda x: sentinel
        if x is None
        else np.array(x[0] if hasattr(x[0], "__len__") else x, dtype=np.float32)
    )


def fix_partial_tensor_list(batch: pd.DataFrame, column: str, shape: Tuple[int, ...]) -> None:
    """Reshape / truncate / zero-extend ragged tensor lists to ``shape``
    (reference ``feature_utils.py:91-102``)."""
    numel = int(np.prod(shape))

    def _func(x):
        x = np.asarray(x, dtype=np.float32)
        if int(np.prod(x.shape)) == numel:
            return x.reshape(shape)
        x = x.reshape(-1, *shape[1:])
        if shape[0] < x.shape[0]:
            return x[: shape[0]]
        residual = (shape[0] - x.shape[0], *shape[1:])
        return np.concatenate((x, np.zeros(residual, dtype=np.float32)), axis=0)

    batch[column] = batch[column].apply(_func)


def fill_na(batch: pd.DataFrame) -> None:
    for col in batch.columns:
        if batch[col].dtype.kind in "fiu":
            batch[col] = batch[col].fillna(C.NA_NUMERICAL_VALUE)


# ----- structural -----------------------------------------------------------


def rename_column(batch: pd.DataFrame, src_column: str, target_column: str) -> None:
    batch.rename({src_column: target_column}, inplace=True, axis=1)


def copy_value(batch: pd.DataFrame, src_column: str, target_column: str) -> None:
    batch[target_column] = batch[src_column]


# ----- value transforms -----------------------------------------------------


def create_array_one_hot_feature(batch: pd.DataFrame, column: str) -> None:
    """'0010…' string → indices of '1's, padded to fixed length with -1
    (reference ``feature_utils.py:117-123``)."""
    out = []
    for val in batch[column].values.tolist():
        chars = np.frombuffer(str(val).encode("ascii", "replace"), dtype=np.uint8)
        indices = np.nonzero(chars == ord(C.ONE_HOT_POSITIVE_VALUE))[0]
        out.append(
            pad_array(
                indices[: C.ONE_HOT_STRING_ONES_MAX_LENGTH],
                size=C.ONE_HOT_STRING_ONES_MAX_LENGTH,
                pad_token=C.ONE_HOT_STRING_ONES_PAD_TOKEN,
            )
        )
    batch[column] = out


def box_lat_long_feature(batch: pd.DataFrame, column: str) -> None:
    vals = pd.to_numeric(batch[column], errors="coerce").fillna(-1.0)
    batch[column] = np.asarray(vals, dtype=np.float64)


def transform_value_to_lower(batch: pd.DataFrame, column: str) -> None:
    batch[column] = batch[column].astype(str).str.lower()


def xxhash_categorical_values_to_number(
    batch: pd.DataFrame, column: str, value_to_lower: bool
) -> None:
    seed = hash_feature_name_to_int(column)
    batch[column] = hash_strings_to_long(
        [str(v) for v in batch[column].values], seed, value_to_lower
    )


def handle_categorical_history_feature(
    batch: pd.DataFrame,
    column: str,
    hash_ids: bool,
    history_length: int,
    history_id_feature_name: str,
    remove_history_id_from_history: bool = False,
) -> None:
    """Hash / leak-filter / truncate / pad a history column.

    Reference ``feature_utils.py:149-179``: optionally hash every history id
    (seeded by the *current-item* feature name so history ids share the item
    id space), drop the current item id from history (label-leak removal),
    cap and right-pad to ``history_length``.
    """
    if not hash_ids and not remove_history_id_from_history:
        truncate_and_pad_to_fix_len(batch, column, history_length)
        return

    seed = hash_feature_name_to_int(history_id_feature_name)
    processed = []
    for current_id, history in zip(
        batch[history_id_feature_name].values, batch[column].values
    ):
        if hash_ids:
            hist = hash_strings_to_long(
                [str(h) for h in history], seed, value_to_lower=False
            )
        else:
            hist = np.asarray(history, dtype=np.int64)
        if remove_history_id_from_history:
            hist = hist[hist != current_id]
        processed.append(pad_array(hist[:history_length], size=history_length))
    batch[column] = processed


def truncate_and_pad_to_fix_len(batch: pd.DataFrame, column: str, length: int) -> None:
    batch[column] = [pad_array(x, size=length) for x in batch[column].values]
