"""Storage layer: one ABC over local FS / DBFS / S3 / in-memory stores.

Rebuild of reference ``commons/data/data_store.py:51-350``: list data paths
for dates, read a single parquet into a DataFrame, upload artifacts — with
exponential-backoff retry on S3 and ``_SUCCESS``-marker filtering.  boto3 is
optional (absent in the TPU image); the S3 store raises a clear error if
used without it.  ``FakeDataStore`` replaces S3 in tests (SURVEY.md §4).
"""

from __future__ import annotations

import abc
import datetime
import glob
import io
import logging
import os
import random
import time
from typing import Dict, List, Optional

import pandas as pd

from recommendations_tpu.config.trainer_config import FileSystemConfig, FileSystemKind

logger = logging.getLogger(__name__)


def get_date_range_str(date: str, steps: int, backward: bool) -> List[str]:
    """N dates ending (backward) or starting (forward) at ``date``
    (YYYYMMDD) — reference ``data_store.py:25-37``."""
    d = datetime.datetime.strptime(date, "%Y%m%d")
    sign = -1 if backward else 1
    return [(d + sign * datetime.timedelta(days=i)).strftime("%Y%m%d") for i in range(steps)]


def sample_paths(paths: List[str], data_ratio: float, seed: Optional[int] = 17) -> List[str]:
    if data_ratio >= 1.0:
        return paths
    rng = random.Random(seed)
    k = max(1, int(len(paths) * data_ratio))
    return sorted(rng.sample(paths, k))


class DataStoreInterface(abc.ABC):
    @abc.abstractmethod
    def get_training_data_paths_for_dates(
        self, data_dates: List[str], data_ratio: float = 1.0
    ) -> List[str]:
        ...

    @abc.abstractmethod
    def read_single_parquet_file(
        self, path: str, columns: Optional[List[str]] = None
    ) -> Optional[pd.DataFrame]:
        ...

    @abc.abstractmethod
    def get_file_from_path(self, path: str) -> bytes:
        ...

    @abc.abstractmethod
    def upload_dir_recursive(self, local_directory: str, folder: str) -> None:
        ...

    def parquet_num_rows(self, path: str) -> Optional[int]:
        """Row count from parquet metadata WITHOUT reading the data, or None
        if the store cannot answer cheaply. Powers O(1) mid-epoch resume:
        the generator skips already-consumed chunks by metadata instead of
        re-reading and re-transforming them (VERDICT r2 #5)."""
        return None

    @staticmethod
    def _is_data_file(name: str) -> bool:
        base = os.path.basename(name)
        return not (
            base.startswith("_") or base.startswith(".") or base == "" or base.endswith(".crc")
        )


class LocalDataStore(DataStoreInterface):
    """Local filesystem store; also serves DBFS (dbfs:/ ↔ /dbfs path
    translation, reference ``data_store.py:262-350``)."""

    def __init__(self, config: FileSystemConfig):
        self.config = config
        if config.kind == FileSystemKind.DBFS:
            self.base = config.dbfs_base.replace("dbfs:/", "/dbfs/")
        else:
            self.base = config.local_dir_prefix or "."

    def _date_dir(self, date: str) -> str:
        template = self.config.path_template or "date={date}"
        return os.path.join(self.base, template.format(date=date))

    def get_training_data_paths_for_dates(self, data_dates, data_ratio=1.0):
        paths: List[str] = []
        for date in data_dates:
            day_dir = self._date_dir(date)
            found = sorted(glob.glob(os.path.join(day_dir, "**", "*"), recursive=True))
            paths.extend(
                p for p in found if os.path.isfile(p) and self._is_data_file(p)
            )
        return sample_paths(paths, data_ratio)

    def read_single_parquet_file(self, path, columns=None):
        try:
            return pd.read_parquet(path, columns=columns)
        except Exception:
            logger.exception("failed reading %s", path)
            return None

    def parquet_num_rows(self, path):
        try:
            import pyarrow.parquet as pq

            return int(pq.read_metadata(path).num_rows)
        except Exception:
            return None

    def get_file_from_path(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def upload_dir_recursive(self, local_directory: str, folder: str) -> None:
        import shutil

        target = os.path.join(self.base, folder)
        os.makedirs(target, exist_ok=True)
        for root, _, files in os.walk(local_directory):
            for name in files:
                src = os.path.join(root, name)
                rel = os.path.relpath(src, local_directory)
                dst = os.path.join(target, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)


class S3DataStore(DataStoreInterface):
    """S3 store with retry/backoff (reference ``data_store.py:106-255``,
    including its boto3-client-vs-resource defect fixed)."""

    def __init__(self, config: FileSystemConfig, max_retries: int = 5):
        try:
            import boto3  # type: ignore
        except ImportError as e:
            raise ImportError(
                "boto3 is required for S3DataStore but is not installed"
            ) from e
        self.config = config
        self.bucket_name = config.s3_bucket_path
        self._s3 = boto3.resource("s3")
        self._client = boto3.client("s3")
        self.max_retries = max_retries

    def _retry(self, fn, *args, **kw):
        delay = 1.0
        for attempt in range(self.max_retries):
            try:
                return fn(*args, **kw)
            except Exception:
                if attempt == self.max_retries - 1:
                    raise
                time.sleep(delay + random.random())
                delay *= 2

    def get_training_data_paths_for_dates(self, data_dates, data_ratio=1.0):
        template = self.config.path_template or "date={date}"
        bucket = self._s3.Bucket(self.bucket_name)
        paths: List[str] = []
        for date in data_dates:
            prefix = template.format(date=date)
            objs = self._retry(lambda p=prefix: list(bucket.objects.filter(Prefix=p)))
            paths.extend(
                f"s3://{self.bucket_name}/{o.key}"
                for o in objs
                if self._is_data_file(o.key)
            )
        return sample_paths(sorted(paths), data_ratio)

    def _strip(self, path: str) -> str:
        prefix = f"s3://{self.bucket_name}/"
        return path[len(prefix):] if path.startswith(prefix) else path

    def read_single_parquet_file(self, path, columns=None):
        import pyarrow.parquet as pq

        try:
            body = self.get_file_from_path(path)
            table = pq.read_table(io.BytesIO(body), columns=columns)
            return table.to_pandas()
        except Exception:
            logger.exception("failed reading %s", path)
            return None

    def get_file_from_path(self, path: str) -> bytes:
        key = self._strip(path)
        obj = self._retry(self._client.get_object, Bucket=self.bucket_name, Key=key)
        return obj["Body"].read()

    def upload_dir_recursive(self, local_directory: str, folder: str) -> None:
        for root, _, files in os.walk(local_directory):
            for name in files:
                src = os.path.join(root, name)
                rel = os.path.relpath(src, local_directory)
                key = f"{folder}/{rel}"
                self._retry(self._client.upload_file, src, self.bucket_name, key)


class FakeDataStore(DataStoreInterface):
    """In-memory store implementing the full interface shape for tests."""

    _tables: Dict[str, pd.DataFrame] = {}
    _files: Dict[str, bytes] = {}

    def __init__(self, config: Optional[FileSystemConfig] = None):
        self.config = config

    @classmethod
    def reset(cls):
        cls._tables.clear()
        cls._files.clear()

    @classmethod
    def put_table(cls, path: str, df: pd.DataFrame):
        cls._tables[path] = df

    def get_training_data_paths_for_dates(self, data_dates, data_ratio=1.0):
        template = (self.config.path_template if self.config else None) or "date={date}"
        out = []
        for date in data_dates:
            prefix = template.format(date=date)
            out.extend(sorted(p for p in self._tables if p.startswith(prefix)))
        return sample_paths(out, data_ratio)

    def read_single_parquet_file(self, path, columns=None):
        df = self._tables.get(path)
        if df is None:
            return None
        return df[columns] if columns else df.copy()

    def parquet_num_rows(self, path):
        df = self._tables.get(path)
        return None if df is None else int(df.shape[0])

    def get_file_from_path(self, path: str) -> bytes:
        return self._files[path]

    def upload_dir_recursive(self, local_directory: str, folder: str) -> None:
        for root, _, files in os.walk(local_directory):
            for name in files:
                src = os.path.join(root, name)
                rel = os.path.relpath(src, local_directory)
                with open(src, "rb") as f:
                    self._files[f"{folder}/{rel}"] = f.read()


class DataStoreAccessor:
    """Factory keyed by FileSystemKind — reference ``data_store.py:95-102``."""

    _instances: Dict[str, DataStoreInterface] = {}

    @classmethod
    def get_instance(cls, fs_config: FileSystemConfig) -> DataStoreInterface:
        key = fs_config.model_dump_json()
        if key not in cls._instances:
            if fs_config.kind == FileSystemKind.S3:
                cls._instances[key] = S3DataStore(fs_config)
            elif fs_config.kind in (FileSystemKind.LOCAL, FileSystemKind.DBFS):
                cls._instances[key] = LocalDataStore(fs_config)
            elif fs_config.kind == FileSystemKind.FAKE:
                cls._instances[key] = FakeDataStore(fs_config)
            else:
                raise ValueError(f"Unsupported filesystem {fs_config.kind}")
        return cls._instances[key]
