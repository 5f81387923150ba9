"""Streaming dataset generator: path chunks → parquet → feature transforms.

Rebuild of reference ``commons/data/simple_dataset_generator.py`` +
``data_loader_strategy.py``: iterate path chunks, read each parquet, apply
the per-kind data mapper, concat the chunk, optional row shuffle; reader
sharding by ``chunk_index % num_shards == shard_id`` (the reference's torch
DataLoader-worker sharding, ``simple_dataset_generator.py:46-50``).
"""

from __future__ import annotations

import abc
import logging
from typing import Callable, Iterator, List, Optional

import pandas as pd

from recommendations_tpu.config.trainer_config import DataLoaderConfig, FileSystemConfig
from recommendations_tpu.data.data_store import DataStoreAccessor
from recommendations_tpu.data.paths import get_path_chunks

logger = logging.getLogger(__name__)

# data_mapper factory: kind ('train'|'val') -> (df -> df)
DfMapperFnForKind = Callable[[str], Callable[[pd.DataFrame], pd.DataFrame]]


class SimpleDatasetGenerator:
    def __init__(
        self,
        kind: str,
        worker_id: int,
        paths: List[str],
        block_size: int,
        columns: List[str],
        data_mapper: DfMapperFnForKind,
        fs_config: FileSystemConfig,
        shuffle_files: bool = True,
        shuffle_data: bool = False,
        seed: Optional[int] = None,
        max_readers: int = 1,
    ):
        self.kind = kind
        self.worker_id = worker_id
        self.max_readers = max_readers
        self.columns = columns
        self.data_mapper = data_mapper
        self.fs_config = fs_config
        self.shuffle_data = shuffle_data
        self.path_chunks = get_path_chunks(paths, block_size, shuffle_files, seed)
        self.shard_id: Optional[int] = None
        self.num_shards: Optional[int] = None
        self._seed = seed
        self._skip_rows = 0
        self._start_chunk = 0

    def set_shard(self, shard_id: int, num_shards: int) -> None:
        self.shard_id = shard_id
        self.num_shards = num_shards

    def set_skip_rows(self, n: int) -> None:
        """Fast-forward the row stream by ``n`` rows on the next iteration.

        Chunks that are entirely before the cursor are skipped by parquet
        METADATA row counts (no read, no transform — O(1) per chunk); the
        chunk containing the cursor is read once and sliced. Assumes the
        data mapper preserves row counts (all compiled transforms do) and
        that the generator is seeded (file order + per-chunk shuffle are
        then deterministic across runs). Powers O(1) mid-epoch resume
        (VERDICT r2 #5) vs the O(steps) read-and-discard replay."""
        self._skip_rows = max(0, int(n))

    def set_start_chunk(self, n: int) -> None:
        """Begin iteration at chunk ordinal ``n`` (of the sharded chunk
        list) without reading the earlier ones — O(1).  The seeded chunk
        order reproduces across runs, so a resumed iterator sees the exact
        chunk stream the snapshot left off at (grouped/shuffled resume,
        ``data/grouping.py:snapshot``)."""
        self._start_chunk = max(0, int(n))

    def _chunk_num_rows(self, store, chunk) -> Optional[int]:
        total = 0
        for p in chunk:
            n = store.parquet_num_rows(p)
            if n is None:
                return None
            total += n
        return total

    @property
    def filtered_path_chunks(self) -> List[List[str]]:
        if self.shard_id is None:
            return self.path_chunks
        return [
            c for i, c in enumerate(self.path_chunks) if i % self.num_shards == self.shard_id
        ]

    def __init_reader_pool(self):
        from concurrent.futures import ThreadPoolExecutor

        return ThreadPoolExecutor(max_workers=max(1, self.max_readers))

    def _read_one(self, store, mapper, path):
        df = store.read_single_parquet_file(path, columns=self.columns)
        if df is None:
            return None
        try:
            return mapper(df)
        except Exception:
            logger.exception("data mapper failed on %s", path)
            return None

    def __iter__(self) -> Iterator[pd.DataFrame]:
        mapper = self.data_mapper(self.kind)
        store = DataStoreAccessor.get_instance(self.fs_config)
        pool = self.__init_reader_pool() if self.max_readers > 1 else None
        skip = self._skip_rows
        self._skip_rows = 0
        start_chunk = self._start_chunk
        self._start_chunk = 0
        try:
            for chunk_idx, chunk in enumerate(self.filtered_path_chunks):
                if chunk_idx < start_chunk:
                    continue
                if skip > 0:
                    nrows = self._chunk_num_rows(store, chunk)
                    if nrows is not None and skip >= nrows:
                        skip -= nrows  # metadata-only skip: no read/transform
                        continue
                if pool is not None:
                    dfs = [d for d in pool.map(
                        lambda p: self._read_one(store, mapper, p), chunk
                    ) if d is not None]
                else:
                    dfs = [
                        d for d in (self._read_one(store, mapper, p) for p in chunk)
                        if d is not None
                    ]
                if dfs:
                    df = pd.concat(dfs, axis=0)
                    if self.shuffle_data:
                        # per-chunk seed: a fixed random_state would shuffle
                        # every chunk with the IDENTICAL permutation pattern
                        # (deterministic across runs via base seed + index)
                        rs = None if self._seed is None else self._seed + chunk_idx
                        df = df.sample(frac=1.0, random_state=rs)
                    if skip > 0:
                        # cursor lands inside this chunk (or metadata was
                        # unavailable): slice off the consumed prefix
                        take = min(skip, df.shape[0])
                        df = df.iloc[take:]
                        skip -= take
                        if df.shape[0] == 0:
                            continue
                    yield df
        finally:
            if pool is not None:
                pool.shutdown(wait=False)


class DataLoaderStrategy(abc.ABC):
    def __init__(
        self,
        data_loader_config: DataLoaderConfig,
        columns: List[str],
        data_mapper: DfMapperFnForKind,
    ):
        self.data_loader_config = data_loader_config
        self.columns = columns
        self.data_mapper = data_mapper

    @abc.abstractmethod
    def load(
        self,
        kind: str,
        worker_id: int,
        paths: List[str],
        fs_config: FileSystemConfig,
        seed: Optional[int] = None,
    ) -> SimpleDatasetGenerator:
        ...


class SimpleDataLoaderStrategy(DataLoaderStrategy):
    def load(self, kind, worker_id, paths, fs_config, seed=None):
        # seeded: file-shuffle order and per-chunk shuffles reproduce across
        # runs, which both resume modes rely on (an unseeded generator made
        # shuffle_files=True resumes silently non-deterministic)
        return SimpleDatasetGenerator(
            kind=kind,
            worker_id=worker_id,
            paths=paths,
            block_size=self.data_loader_config.block_size,
            columns=self.columns,
            data_mapper=self.data_mapper,
            fs_config=fs_config,
            shuffle_files=self.data_loader_config.shuffle_files,
            shuffle_data=self.data_loader_config.shuffle_data,
            seed=seed,
            max_readers=self.data_loader_config.max_readers,
        )


def get_data_loader_strategy(
    data_loader_config: DataLoaderConfig,
    columns: List[str],
    data_mapper: DfMapperFnForKind,
) -> DataLoaderStrategy:
    return SimpleDataLoaderStrategy(data_loader_config, columns, data_mapper)
