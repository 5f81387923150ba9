"""Session grouping + fixed-shape batch forming.

Rebuild of reference ``commons/data/torch_data_loader.py:15-141``
(``GroupedDataframeWrapperDataset`` + ``_make_features_compliant`` +
``_coerce_to_shape``) with the TPU-idiomatic change: the output is a stream
of *fixed-shape* NumPy batches (batch dim exactly ``batch_size``; the last
partial batch is dropped for train and padded+masked for val), because every
distinct shape is a fresh XLA compilation.

The reference's defect #9 (``self._group_config`` never assigned) is fixed by
taking the group config explicitly from ``features.group_dataset``; a model
without grouping (LTHM: one row per user) streams rows directly.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Iterator, List, Optional

import numpy as np
import pandas as pd

from recommendations_tpu.features.feature_config import (
    FeaturesConfig,
    GroupDatasetConfig,
)

logger = logging.getLogger(__name__)

Batch = Dict[str, np.ndarray]


def _coerce_to_shape(feature_name: str, value: List[np.ndarray], shape) -> np.ndarray:
    """Stack a ragged list of per-step vectors to ``shape`` with zero-sentinel
    padding — reference ``torch_data_loader.py:15-26``."""
    sentinel = np.zeros(shape[1:])
    max_hist = shape[0]
    vals = [np.asarray(v) for v in value]
    if max_hist > len(vals):
        vals = vals + (max_hist - len(vals)) * [sentinel]
    elif max_hist < len(vals):
        vals = vals[:max_hist]
    return np.stack(vals, axis=0)


def make_features_compliant(
    columns: Dict[str, Any], features_config: FeaturesConfig
) -> Dict[str, np.ndarray]:
    """Column dict (lists / object arrays) → dense arrays per feature kind —
    reference ``torch_data_loader.py:29-75``."""
    out: Dict[str, np.ndarray] = {}
    for key, col in columns.items():
        values = col.values if hasattr(col, "values") else col

        tf = features_config.get_tensor_feature(key)
        if tf is not None:
            rows = []
            for v in values:
                v = np.asarray(v)
                if v.shape != tf.get_emb_dim_as_shape():
                    v = _coerce_to_shape(key, list(v), tf.get_emb_dim_as_shape())
                rows.append(v)
            out[key] = np.stack(rows, axis=0).astype(np.float32)
            continue

        tlf = features_config.get_tensor_list_feature(key)
        if tlf is not None:
            rows = []
            for v in values:
                v = np.asarray(v, dtype=np.float32)
                if v.shape != tuple(tlf.get_shape()):
                    raise ValueError(
                        f"{key} shape {v.shape} != declared {tlf.get_shape()}"
                    )
                rows.append(v)
            out[key] = np.stack(rows, axis=0)
            continue

        ohf = features_config.get_one_hot_string_feature(key)
        chf = features_config.get_categorical_history_feature(key)
        if ohf is not None or chf is not None:
            out[key] = np.stack([np.asarray(v, dtype=np.int64) for v in values], axis=0)
            continue

        if features_config.is_do_not_convert_to_platform_type(key):
            out[key] = np.asarray(values, dtype=object)
            continue

        arr = np.asarray(values)
        if arr.dtype == object:
            try:
                arr = np.stack([np.asarray(v) for v in values], axis=0)
            except Exception:
                out[key] = np.asarray(values, dtype=object)
                continue
        out[key] = arr
    return out


class GroupedBatchDataset:
    """df stream → (grouped rows) → fixed-shape feature batches.

    ``shuffle_buffer_batches`` (DataLoaderConfig.shuffle_buffer_num_mini_batches)
    holds that many batches' worth of examples in a window and shuffles the
    window before emitting — mixing rows across parquet files/chunks, which
    per-chunk ``shuffle_data`` alone cannot do.  Without session grouping the
    shuffle permutes ROWS; with grouping it permutes whole GROUPS so a
    session's rows stay contiguous and sorted.

    ``macro_batches`` (DataLoaderConfig.macro_batches_multiples) assembles
    ``macro × batch_size`` rows per pandas concat and slices the per-step
    batches out of it — one concat per macro instead of per batch (host
    input-pipeline throughput knob; SURVEY §7 hard part 6).
    """

    def __init__(
        self,
        dataframe_generator: Iterator[pd.DataFrame],
        features_config: FeaturesConfig,
        batch_size: int,
        limit: Optional[int] = None,
        group_config: Optional[GroupDatasetConfig] = None,
        drop_remainder: bool = True,
        columns: Optional[List[str]] = None,
        shuffle_buffer_batches: int = 0,
        macro_batches: int = 1,
        seed: Optional[int] = None,
    ):
        self._gen = dataframe_generator
        self._features = features_config
        self._batch_size = batch_size
        self._limit = limit
        self._group = group_config if group_config is not None else features_config.group_dataset
        self._drop_remainder = drop_remainder
        self._columns = columns
        self._shuffle_buffer_batches = max(0, shuffle_buffer_batches)
        self._macro_batches = max(1, macro_batches)
        self._seed = seed
        # resume snapshots (VERDICT r3 #6): per-emission iterator states
        # recorded at drain boundaries; see snapshot()/restore_snapshot()
        import threading

        self._snap_lock = threading.Lock()
        self._snaps: List[tuple] = []  # (produced_at, state dict)
        self._gen_pieces = 0  # generator chunk-dfs consumed
        self._restore_state: Optional[dict] = None

    def request_skip(self, batches: int) -> bool:
        """Ask the upstream generator to fast-forward ``batches`` worth of
        rows in O(1) (metadata-based). Valid only when the row stream is a
        pure FIFO of generator rows: no session grouping (group filters
        change row counts) and no shuffle buffer (its window mixes rows
        across the cursor). Returns False when the caller must replay
        batches instead."""
        if self._group is not None and self._group.group_by_columns:
            return False
        if self._shuffle_buffer_batches:
            return False
        gen = self._gen
        if not hasattr(gen, "set_skip_rows"):
            return False
        gen.set_skip_rows(batches * self._batch_size)
        return True

    def _split_chunk(self, df: pd.DataFrame) -> List[pd.DataFrame]:
        """One generator chunk-df → its row pieces (the df itself, or its
        filtered+sorted session groups).  A whole chunk's pieces enter the
        pending window TOGETHER so the iterator state at any emission is
        exactly (chunks consumed, pending window, rng) — the snapshot that
        powers grouped/shuffled O(1) resume."""
        if self._group is None or not self._group.group_by_columns:
            return [df]
        pieces = []
        for _, rows in df.groupby(by=self._group.group_by_columns):
            n = rows.shape[0]
            if n < self._group.minimum_group_size:
                continue
            if (
                self._group.maximum_group_size is not None
                and n > self._group.maximum_group_size
            ):
                continue
            if self._group.sort_by_columns:
                rows = rows.sort_values(
                    by=self._group.sort_by_columns,
                    ascending=not self._group.sort_reverse,
                )
            pieces.append(rows.reset_index(drop=True))
        return pieces

    # -- resume snapshots (VERDICT r3 #6) ------------------------------------
    # The grouped / shuffle-buffered stream cannot be row-skipped by parquet
    # metadata (group filters change row counts; the shuffle window mixes
    # rows across the cursor).  Instead the iterator records, at every drain
    # boundary, a state tuple (generator chunk cursor, live pending window,
    # shuffle-RNG state, batches produced).  ``snapshot(B)`` returns the
    # newest state at-or-before consumer batch B (plus how many batches to
    # discard after restoring — at most one macro's worth); restoring costs
    # O(pending window), independent of how many steps were consumed.

    _SNAP_KEEP = 64  # producer runs ahead of the consumer by prefetch depth

    def _record_snap(self, produced: int, pending, pending_rows, rng) -> None:
        state = {
            "produced": produced,
            "gen_pieces": self._gen_pieces,
            "pending": list(pending),  # df references; never mutated
            "pending_rows": pending_rows,
            "rng_state": rng.get_state() if rng is not None else None,
        }
        with self._snap_lock:
            self._snaps.append((produced, state))
            if len(self._snaps) > self._SNAP_KEEP:
                del self._snaps[: -self._SNAP_KEEP]

    def snapshot(self, consumed_batches: int) -> Optional[bytes]:
        """Pickled resume state for 'the consumer has taken N batches', or
        None if the producer has not reached a recordable boundary yet (the
        caller falls back to replay)."""
        import pickle

        with self._snap_lock:
            best = None
            for produced, state in self._snaps:
                if produced <= consumed_batches and (
                    best is None or produced > best["produced"]
                ):
                    best = state
        if best is None:
            return None
        payload = dict(best)
        payload["discard_batches"] = consumed_batches - best["produced"]
        return pickle.dumps(payload, protocol=4)

    def restore_snapshot(self, blob: bytes) -> int:
        """Arm the next ``__iter__`` to resume from a ``snapshot()`` blob.
        Returns the number of batches the caller must discard after restore
        (< macro_batches; the snapshot is drain-boundary aligned)."""
        import pickle

        self._restore_state = pickle.loads(blob)
        return int(self._restore_state.get("discard_batches", 0))

    def __iter__(self) -> Iterator[Batch]:
        produced = 0
        pending: List[pd.DataFrame] = []
        pending_rows = 0
        grouping = self._group is not None and bool(self._group.group_by_columns)
        rng = (
            np.random.RandomState(0 if self._seed is None else self._seed)
            if self._shuffle_buffer_batches
            else None
        )
        self._gen_pieces = 0
        if self._restore_state is not None:
            st = self._restore_state
            self._restore_state = None
            produced = int(st["produced"])
            pending = list(st["pending"])
            pending_rows = int(st["pending_rows"])
            self._gen_pieces = int(st["gen_pieces"])
            if rng is not None and st["rng_state"] is not None:
                rng.set_state(st["rng_state"])
            if hasattr(self._gen, "set_start_chunk"):
                self._gen.set_start_chunk(self._gen_pieces)
            elif self._gen_pieces:
                raise ValueError(
                    "snapshot restore requires a generator with set_start_chunk"
                )
        emit_rows = self._batch_size * self._macro_batches
        buffer_rows = self._batch_size * self._shuffle_buffer_batches
        # keep buffer_rows of lookahead behind every emission so the shuffle
        # window always spans at least that many future rows
        threshold = emit_rows + buffer_rows

        def _emit(df: pd.DataFrame) -> Iterator[Batch]:
            for s in range(0, df.shape[0], self._batch_size):
                yield make_features_compliant(
                    dict(df.iloc[s : s + self._batch_size]), self._features
                )

        def _drain(n_rows: int) -> pd.DataFrame:
            nonlocal pending, pending_rows
            if rng is not None and grouping:
                # permute whole groups; intra-group order stays sorted
                order = rng.permutation(len(pending))
                pending = [pending[j] for j in order]
            df = pd.concat(pending, axis=0) if len(pending) > 1 else pending[0]
            if rng is not None and not grouping:
                df = df.sample(frac=1.0, random_state=rng)
            head, rest = df.iloc[:n_rows], df.iloc[n_rows:]
            pending = [rest] if rest.shape[0] else []
            pending_rows = rest.shape[0]
            return head

        def _drain_backlog():
            # every drain the current window affords; also runs FIRST after
            # a snapshot restore — a state recorded mid-backlog (window
            # still >= threshold) must finish draining BEFORE the next
            # chunk is read, or the shuffle window composition diverges
            nonlocal produced
            while pending_rows >= threshold:
                for batch in _emit(_drain(emit_rows)):
                    produced += 1
                    yield batch
                self._record_snap(produced, pending, pending_rows, rng)

        self._record_snap(produced, pending, pending_rows, rng)
        emitted = 0
        for batch in _drain_backlog():
            emitted += 1
            yield batch
            if self._limit is not None and emitted >= self._limit:
                return
        for chunk_df in self._gen:
            self._gen_pieces += 1
            for piece in self._split_chunk(chunk_df):
                if self._columns is not None:
                    keep = [c for c in piece.columns if c in self._columns]
                    piece = piece[keep]
                pending.append(piece)
                pending_rows += piece.shape[0]
            for batch in _drain_backlog():
                emitted += 1
                yield batch
                if self._limit is not None and emitted >= self._limit:
                    return
        # generator exhausted: flush whatever full batches remain
        while pending_rows >= self._batch_size:
            n = (pending_rows // self._batch_size) * self._batch_size
            for batch in _emit(_drain(n)):
                produced += 1
                emitted += 1
                yield batch
                if self._limit is not None and emitted >= self._limit:
                    return
            self._record_snap(produced, pending, pending_rows, rng)
        if pending and pending_rows and not self._drop_remainder:
            df = pd.concat(pending, axis=0) if len(pending) > 1 else pending[0]
            n = df.shape[0]
            # pad by repeating rows; '_pad_mask' marks the synthetic tail
            reps = int(np.ceil(self._batch_size / n))
            df = pd.concat([df] * reps, axis=0).iloc[: self._batch_size]
            batch = make_features_compliant(dict(df), self._features)
            batch["_pad_mask"] = (np.arange(self._batch_size) >= n)
            yield batch
