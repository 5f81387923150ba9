"""Dataset path resolution and sharding.

Rebuild of reference ``commons/data/dataset_generator_utils.py``: date-range →
paths via the data store, glob override, exclude dates, contiguous per-host
split with remainder distribution, block chunking.
"""

from __future__ import annotations

import glob
import math
from typing import List, Optional

import numpy as np

from recommendations_tpu.config.trainer_config import TrainDatasetConfig
from recommendations_tpu.data.data_store import DataStoreAccessor, get_date_range_str


def get_paths_for_worker(
    worker_id: int,
    data_paths: List[str],
    num_workers: int,
    seed: Optional[int] = None,
) -> List[str]:
    """Contiguous split with remainder to the first workers —
    reference ``dataset_generator_utils.py:13-34``."""
    data_paths = sorted(data_paths)
    if seed is not None:
        rng = np.random.RandomState(seed)
        data_paths = list(np.array(data_paths)[rng.permutation(len(data_paths))])
    total = len(data_paths)
    per = math.floor(total / num_workers)
    rem = total % num_workers
    count = per + (1 if rem > worker_id else 0)
    start = worker_id * per + min(rem, worker_id)
    return data_paths[start : min(total, start + count)]


def get_path_chunks(
    paths: List[str], block_size: int, shuffle_files: bool = False, seed: Optional[int] = None
) -> List[List[str]]:
    arr = np.array(paths)
    if shuffle_files:
        rng = np.random.RandomState(seed)
        rng.shuffle(arr)
    num_segments = max(1, len(arr) // block_size)
    return [list(p) for p in np.array_split(arr, num_segments)]


def _resolve_dates(
    date: str, steps: int, backward: bool, exclude: List[str]
) -> List[str]:
    dates = get_date_range_str(date=date, steps=steps, backward=backward)
    if exclude:
        dates = [d for d in dates if d not in exclude]
    if not dates:
        raise ValueError("date range is empty after exclusions")
    return dates


def get_train_data_paths(dataset_config: TrainDatasetConfig) -> List[str]:
    if dataset_config.path_glob_train:
        return sorted(glob.glob(dataset_config.path_glob_train))
    dates = _resolve_dates(
        dataset_config.train_data_end_date,
        dataset_config.train_period_in_days,
        backward=True,
        exclude=dataset_config.exclude_dates,
    )
    store = DataStoreAccessor.get_instance(dataset_config.filesystem_config)
    return store.get_training_data_paths_for_dates(dates, dataset_config.train_data_ratio)


def get_val_data_paths(
    dataset_config: TrainDatasetConfig, for_extra_day: bool = False
) -> List[str]:
    if dataset_config.path_glob_test:
        return sorted(glob.glob(dataset_config.path_glob_test))
    if for_extra_day:
        if (
            dataset_config.extra_day_val_data_start_date is None
            or dataset_config.extra_day_val_period_in_days <= 0
        ):
            return []
        dates = _resolve_dates(
            dataset_config.extra_day_val_data_start_date,
            dataset_config.extra_day_val_period_in_days,
            backward=False,
            exclude=dataset_config.exclude_dates,
        )
        ratio = dataset_config.extra_day_val_data_ratio
    else:
        dates = _resolve_dates(
            dataset_config.val_data_start_date,
            dataset_config.val_period_in_days,
            backward=False,
            exclude=dataset_config.exclude_dates,
        )
        ratio = dataset_config.val_data_ratio
    store = DataStoreAccessor.get_instance(dataset_config.filesystem_config)
    return store.get_training_data_paths_for_dates(dates, ratio)
