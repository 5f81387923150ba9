"""Data pipeline tests: path logic, streaming generator, fixed-shape batches
(SURVEY.md §4 'fake in-memory DataStore')."""

import numpy as np
import pandas as pd
import pytest

from recommendations_tpu.config.trainer_config import (
    DataLoaderConfig,
    FileSystemConfig,
    TrainDatasetConfig,
)
from recommendations_tpu.data import (
    FakeDataStore,
    GroupedBatchDataset,
    HostDataLoader,
    get_data_loader_strategy,
    get_date_range_str,
    get_path_chunks,
    get_paths_for_worker,
    get_train_data_paths,
    get_val_data_paths,
    get_host_dataloader,
)
from recommendations_tpu.features import FeaturesConfig
from recommendations_tpu.tools.synth_data import make_click_log, _pad_lists


def test_date_range():
    assert get_date_range_str("20240105", 3, backward=True) == [
        "20240105", "20240104", "20240103",
    ]
    assert get_date_range_str("20240105", 2, backward=False) == ["20240105", "20240106"]


def test_paths_for_worker_contiguous_with_remainder():
    paths = [f"p{i}" for i in range(10)]
    got = [get_paths_for_worker(w, paths, 4) for w in range(4)]
    assert [len(g) for g in got] == [3, 3, 2, 2]
    assert sum(got, []) == sorted(paths)


def test_path_chunks():
    chunks = get_path_chunks([f"p{i}" for i in range(7)], block_size=2)
    assert len(chunks) == 3
    assert sum(len(c) for c in chunks) == 7


def _fs():
    return FileSystemConfig(kind="fake", path_template="tbl/date={date}")


def _dataset_config(**over):
    base = dict(
        filesystem_config=_fs(),
        exclude_dates=[],
        train_data_ratio=1.0,
        val_data_ratio=1.0,
        train_data_end_date="20240102",
        train_period_in_days=2,
        val_data_start_date="20240103",
        val_period_in_days=1,
    )
    base.update(over)
    return TrainDatasetConfig(**base)


def _seed_store():
    FakeDataStore.reset()
    for date in ["20240101", "20240102", "20240103"]:
        for p in range(2):
            df = make_click_log(num_users=8, history_len=8, num_products=50, seed=p)
            FakeDataStore.put_table(f"tbl/date={date}/part-{p}.parquet", df)


def test_train_val_paths_with_excludes():
    _seed_store()
    cfg = _dataset_config()
    assert len(get_train_data_paths(cfg)) == 4  # 2 dates x 2 files
    assert len(get_val_data_paths(cfg)) == 2
    cfg2 = _dataset_config(exclude_dates=["20240101"])
    assert len(get_train_data_paths(cfg2)) == 2


def _features(history_len=8):
    return FeaturesConfig(
        defaults={
            "categorical_features": {
                "default_dtype": "string",
                "transform_value_to_lowercase": False,
                "value_to_number_mapper": {"kind": "xxhash"},
            },
        },
        categorical_features=[{"name": "product_id", "kind": "categorical"}],
        categorical_history_features=[
            {
                "name": "product_ids",
                "kind": "categorical_history",
                "history_length": history_len,
                "history_id_feature_name": "product_id",
                "value_to_number_mapper": {"kind": "xxhash"},
            }
        ],
        tensor_list_features=[
            {"name": "labels", "kind": "tensor_list", "shape": (history_len,)},
            {"name": "timestamps", "kind": "tensor_list", "shape": (history_len,)},
        ],
    )


def test_end_to_end_host_loader_fixed_shapes():
    _seed_store()
    feats = _features()
    # the fake-store tables carry raw (unpadded) lists; re-seed with padded
    FakeDataStore.reset()
    for date in ["20240101", "20240102"]:
        for p in range(2):
            df = _pad_lists(
                make_click_log(num_users=8, history_len=8, num_products=50, seed=p), 8
            )
            FakeDataStore.put_table(f"tbl/date={date}/part-{p}.parquet", df)

    strategy = get_data_loader_strategy(
        DataLoaderConfig(block_size=1, max_prefetch=2, shuffle_files=False),
        columns=feats.get_input_columns(),
        data_mapper=lambda kind: feats.default_data_mapper,
    )
    loader = get_host_dataloader(
        kind="train",
        worker_id=0,
        paths=get_train_data_paths(_dataset_config()),
        batch_size=4,
        num_steps=None,
        data_loader_strategy=strategy,
        features_config=feats,
        fs_config=_fs(),
    )
    batches = list(loader)
    assert len(batches) == 8  # 4 files x 8 users / 4
    for b in batches:
        assert b["product_ids"].shape == (4, 8)
        assert b["product_ids"].dtype == np.int64
        assert b["labels"].shape == (4, 8)
        assert b["timestamps"].shape == (4, 8)
        # hashed ids span the full int64 range; pads are 0
        assert (np.abs(b["product_ids"][b["product_ids"] != 0]) > 2**32).all()


def test_generator_shard_filtering():
    _seed_store()
    feats = _features()
    strategy = get_data_loader_strategy(
        DataLoaderConfig(block_size=1, shuffle_files=False),
        columns=feats.get_input_columns(),
        data_mapper=lambda kind: (lambda df: df),
    )
    gen = strategy.load("train", 0, get_train_data_paths(_dataset_config()), _fs())
    gen.set_shard(0, 2)
    n0 = len(list(gen))
    gen.set_shard(1, 2)
    # shard views partition the chunks
    gen2 = strategy.load("train", 0, get_train_data_paths(_dataset_config()), _fs())
    gen2.set_shard(1, 2)
    n1 = len(list(gen2))
    assert n0 + n1 == 4


def test_grouped_dataset_session_grouping():
    """Group-by + min-size filter + sort (reference torch_data_loader.py:119-141)."""
    df = pd.DataFrame(
        {
            "user": ["a", "a", "a", "b", "c", "c"],
            "t": [3, 1, 2, 5, 9, 8],
            "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    feats = FeaturesConfig(
        defaults={},
        numerical_features=[{"name": "x", "kind": "numerical"}],
        group_dataset={
            "group_by_columns": ["user"],
            "sort_by_columns": ["t"],
            "sort_reverse": False,
            "minimum_group_size": 2,
        },
    )
    ds = GroupedBatchDataset(
        iter([df]), feats, batch_size=5, drop_remainder=True
    )
    batches = list(ds)
    # groups: a (3 rows sorted by t asc), c (2 rows); b filtered (size 1)
    assert len(batches) == 1
    np.testing.assert_allclose(batches[0]["x"], [2.0, 3.0, 1.0, 6.0, 5.0])


def test_partial_batch_padding_for_val():
    df = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    feats = FeaturesConfig(defaults={}, numerical_features=[{"name": "x", "kind": "numerical"}])
    ds = GroupedBatchDataset(iter([df]), feats, batch_size=4, drop_remainder=False)
    [b] = list(ds)
    assert b["x"].shape == (4,)
    np.testing.assert_array_equal(b["_pad_mask"], [False, False, False, True])


def test_loader_propagates_reader_errors():
    def bad_gen():
        yield pd.DataFrame({"x": [1.0]})
        raise RuntimeError("boom")

    feats = FeaturesConfig(defaults={}, numerical_features=[{"name": "x", "kind": "numerical"}])
    ds = GroupedBatchDataset(bad_gen(), feats, batch_size=1)
    with pytest.raises(RuntimeError, match="boom"):
        list(HostDataLoader(ds))


def test_stats_quantiles():
    """Streaming histogram quantiles vs np.quantile on a normal sample
    (the stats job the reference configures but never wrote)."""
    import pandas as pd
    from recommendations_tpu.pipeline.stats import StatsConfig, compute_stats

    rs = np.random.RandomState(0)
    frames = [pd.DataFrame({"price": rs.randn(5000) * 10 + 50}) for _ in range(4)]
    stats = compute_stats(
        StatsConfig(compute_stats=True, num_bins=400, num_quantiles=20),
        ["price"],
        iter(frames),
    )
    got = np.asarray(stats["price"])
    allv = np.concatenate([f["price"].values for f in frames])
    want = np.quantile(allv, np.linspace(0, 1, 21)[1:-1])
    np.testing.assert_allclose(got, want, atol=0.5)


class _ChunkGen:
    """Minimal generator with the set_start_chunk contract: yields chunk
    dfs from a seeded order, resumable at a chunk ordinal."""

    def __init__(self, dfs):
        self._dfs = dfs
        self._start = 0

    def set_start_chunk(self, n):
        self._start = n

    def __iter__(self):
        start, self._start = self._start, 0
        for df in self._dfs[start:]:
            yield df


def _session_frames(n_chunks=10, rows_per_chunk=24, seed=0):
    rs = np.random.RandomState(seed)
    frames = []
    uid = 0
    for c in range(n_chunks):
        users, ts, xs = [], [], []
        n = 0
        while n < rows_per_chunk:
            size = rs.randint(1, 5)
            for i in range(size):
                users.append(f"u{uid}")
                ts.append(rs.randint(0, 100))
                xs.append(float(uid) + 0.01 * i)
            uid += 1
            n += size
        frames.append(pd.DataFrame({"user": users, "t": ts, "x": xs}))
    return frames


def _grouped_feats():
    return FeaturesConfig(
        defaults={},
        numerical_features=[{"name": "x", "kind": "numerical"}],
        group_dataset={
            "group_by_columns": ["user"],
            "sort_by_columns": ["t"],
            "sort_reverse": False,
            "minimum_group_size": 2,
        },
    )


@pytest.mark.parametrize("shuffle_buffer", [0, 3])
def test_grouped_snapshot_resume_identical_batches(shuffle_buffer):
    """O(1) snapshot resume for grouped (+ shuffle-buffered) pipelines
    (VERDICT r3 #6): restore at batch B → the remaining stream is
    bit-identical to the uninterrupted run, without re-reading consumed
    chunks."""
    feats = _grouped_feats()
    kw = dict(
        features_config=feats, batch_size=4,
        shuffle_buffer_batches=shuffle_buffer, macro_batches=2, seed=123,
    )
    frames = _session_frames()
    full = list(GroupedBatchDataset(_ChunkGen(frames), **kw))
    assert len(full) >= 10

    ds = GroupedBatchDataset(_ChunkGen(frames), **kw)
    it = iter(ds)
    consumed = 7  # mid-macro on purpose: exercises discard alignment
    for i in range(consumed):
        got = next(it)
        np.testing.assert_array_equal(got["x"], full[i]["x"])
    blob = ds.snapshot(consumed)
    assert blob is not None

    # resume into a FRESH dataset over a generator that tracks chunk skips
    gen2 = _ChunkGen(frames)
    ds2 = GroupedBatchDataset(gen2, **kw)
    discard = ds2.restore_snapshot(blob)
    assert 0 <= discard < 2 * 4  # < macro_batches * ... alignment batches
    it2 = iter(ds2)
    for _ in range(discard):
        next(it2)
    rest = list(it2)
    assert len(rest) == len(full) - consumed
    for a, b in zip(rest, full[consumed:]):
        np.testing.assert_array_equal(a["x"], b["x"])


def test_snapshot_resume_skips_consumed_chunks():
    """The restored generator starts at the snapshot's chunk cursor —
    consumed chunks are never re-read (the O(1)-in-steps property)."""
    feats = _grouped_feats()
    frames = _session_frames()
    reads = []

    class CountingGen(_ChunkGen):
        def __iter__(self):
            start, self._start = self._start, 0
            for i, df in enumerate(self._dfs[start:], start=start):
                reads.append(i)
                yield df

    kw = dict(features_config=feats, batch_size=4, shuffle_buffer_batches=2,
              macro_batches=1, seed=7)
    ds = GroupedBatchDataset(CountingGen(frames), **kw)
    it = iter(ds)
    for _ in range(8):
        next(it)
    blob = ds.snapshot(8)
    first_reads = list(reads)

    import pickle

    cursor = pickle.loads(blob)["gen_pieces"]
    assert cursor > 0 and first_reads[: cursor] == list(range(cursor))

    reads.clear()
    ds2 = GroupedBatchDataset(CountingGen(frames), **kw)
    discard = ds2.restore_snapshot(blob)
    it2 = iter(ds2)
    # drain to exhaustion: every chunk the resumed run reads must be AT or
    # AFTER the snapshot's cursor — consumed chunks are never re-read
    n_rest = sum(1 for _ in it2)
    assert n_rest > discard
    assert reads, "resumed run never reached the generator"
    assert min(reads) == cursor, (reads, cursor)
