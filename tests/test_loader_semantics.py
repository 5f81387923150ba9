"""Declared data-loader knobs actually do things (VERDICT round-1 #4):
per-chunk-varying shuffle seeds, shuffle_buffer_num_mini_batches,
macro_batches_multiples, bypass_dataloader, mini_batch_size (trace batch)."""

import numpy as np
import pandas as pd

from recommendations_tpu.config.trainer_config import (
    DataLoaderConfig,
    FileSystemConfig,
)
from recommendations_tpu.data import (
    FakeDataStore,
    GroupedBatchDataset,
    HostDataLoader,
    get_data_loader_strategy,
    get_host_dataloader,
)
from recommendations_tpu.features import FeaturesConfig


def _fs():
    return FileSystemConfig(kind="fake", path_template="tbl/date={date}")


def _x_features():
    return FeaturesConfig(
        defaults={}, numerical_features=[{"name": "x", "kind": "numerical"}]
    )


def _seed_two_identical_files():
    FakeDataStore.reset()
    df = pd.DataFrame({"x": np.arange(32, dtype=np.float64)})
    FakeDataStore.put_table("tbl/date=20240101/a.parquet", df)
    FakeDataStore.put_table("tbl/date=20240101/b.parquet", df)
    return ["tbl/date=20240101/a.parquet", "tbl/date=20240101/b.parquet"]


def test_shuffle_seed_varies_per_chunk():
    """Round-1 defect: a fixed random_state shuffled every chunk with the
    identical permutation.  Two chunks of identical content must come out in
    different orders (while staying deterministic for a given base seed)."""
    paths = _seed_two_identical_files()
    strategy = get_data_loader_strategy(
        DataLoaderConfig(block_size=1, shuffle_files=False, shuffle_data=True),
        columns=["x"],
        data_mapper=lambda kind: (lambda df: df),
    )
    gen = strategy.load("train", 0, paths, _fs())
    gen._seed = 7  # deterministic base
    chunks = [np.asarray(df["x"]) for df in gen]
    assert len(chunks) == 2
    assert not np.array_equal(chunks[0], chunks[1]), "chunks shuffled identically"
    # deterministic: same base seed → same per-chunk orders
    gen2 = strategy.load("train", 0, paths, _fs())
    gen2._seed = 7
    chunks2 = [np.asarray(df["x"]) for df in gen2]
    np.testing.assert_array_equal(chunks[0], chunks2[0])
    np.testing.assert_array_equal(chunks[1], chunks2[1])


def test_shuffle_buffer_mixes_across_pieces():
    """With a shuffle buffer, early batches must contain rows from more than
    one source dataframe; without it, the first batch is file-ordered."""
    feats = _x_features()
    dfs = [
        pd.DataFrame({"x": np.arange(16, dtype=np.float64)}),
        pd.DataFrame({"x": np.arange(16, 32, dtype=np.float64)}),
    ]
    plain = GroupedBatchDataset(iter([d.copy() for d in dfs]), feats, batch_size=8)
    first_plain = next(iter(plain))["x"]
    np.testing.assert_allclose(first_plain, np.arange(8.0))

    buffered = GroupedBatchDataset(
        iter([d.copy() for d in dfs]), feats, batch_size=8,
        shuffle_buffer_batches=2, seed=3,
    )
    batches = [b["x"] for b in buffered]
    # nothing lost, nothing duplicated
    all_rows = np.sort(np.concatenate(batches))
    np.testing.assert_allclose(all_rows, np.arange(32.0))
    # at least one of the first two batches mixes rows from both halves
    mixed = any((b < 16).any() and (b >= 16).any() for b in batches[:2])
    assert mixed, f"no cross-file mixing: {batches[:2]}"


def test_shuffle_buffer_keeps_groups_atomic():
    """With session grouping the buffer permutes GROUPS; each group's rows
    stay contiguous and sorted."""
    df = pd.DataFrame(
        {
            "user": ["a", "a", "b", "b", "c", "c", "d", "d"],
            "t": [2, 1, 4, 3, 6, 5, 8, 7],
            "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
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
        iter([df]), feats, batch_size=4, shuffle_buffer_batches=1, seed=11
    )
    rows = np.concatenate([b["x"] for b in ds])
    assert rows.shape == (8,)
    # sorted-by-t pairs: (2,1)->(2.0,1.0), (4,3)->(4.0,3.0), ...
    pairs = rows.reshape(4, 2)
    for hi, lo in pairs:
        assert hi == lo + 1.0, f"group split or unsorted: {pairs}"


def test_macro_batches_same_rows_fixed_shapes():
    feats = _x_features()
    dfs = [pd.DataFrame({"x": np.arange(i * 10, (i + 1) * 10, dtype=np.float64)})
           for i in range(4)]
    ds = GroupedBatchDataset(
        iter(dfs), feats, batch_size=8, macro_batches=3
    )
    batches = list(ds)
    assert all(b["x"].shape == (8,) for b in batches)
    np.testing.assert_allclose(
        np.concatenate([b["x"] for b in batches]), np.arange(40.0)
    )
    assert len(batches) == 5  # 40 rows / 8


def test_limit_respected_with_macro_batches():
    feats = _x_features()
    ds = GroupedBatchDataset(
        iter([pd.DataFrame({"x": np.arange(64, dtype=np.float64)})]),
        feats, batch_size=8, macro_batches=4, limit=3,
    )
    assert len(list(ds)) == 3


def test_bypass_dataloader_returns_dataset():
    paths = _seed_two_identical_files()
    feats = _x_features()
    strategy = get_data_loader_strategy(
        DataLoaderConfig(block_size=1, shuffle_files=False, bypass_dataloader=True),
        columns=["x"],
        data_mapper=lambda kind: (lambda df: df),
    )
    loader = get_host_dataloader(
        kind="train", worker_id=0, paths=paths, batch_size=8, num_steps=None,
        data_loader_strategy=strategy, features_config=feats, fs_config=_fs(),
    )
    assert isinstance(loader, GroupedBatchDataset)
    assert not isinstance(loader, HostDataLoader)
    assert len(list(loader)) == 8  # 64 rows / 8, content still flows


def test_val_loader_ignores_shuffle_buffer():
    """Val order must be stable regardless of the train shuffle knobs."""
    paths = _seed_two_identical_files()
    feats = _x_features()
    strategy = get_data_loader_strategy(
        DataLoaderConfig(
            block_size=1, shuffle_files=False,
            shuffle_buffer_num_mini_batches=4, macro_batches_multiples=2,
        ),
        columns=["x"],
        data_mapper=lambda kind: (lambda df: df),
    )
    loader = get_host_dataloader(
        kind="val", worker_id=0, paths=paths, batch_size=8, num_steps=None,
        data_loader_strategy=strategy, features_config=feats, fs_config=_fs(),
    )
    first = next(iter(loader))["x"]
    np.testing.assert_allclose(first, np.arange(8.0))


def _seed_many_files(n_files=6, rows=32):
    FakeDataStore.reset()
    paths = []
    for i in range(n_files):
        df = pd.DataFrame({"x": np.arange(rows, dtype=np.float64) + 1000 * i})
        p = f"tbl/date=20240101/f{i}.parquet"
        FakeDataStore.put_table(p, df)
        paths.append(p)
    return paths


def test_o1_resume_skip_matches_replay_under_shuffle():
    """O(1) metadata skip (VERDICT r2 #5): with shuffle_files=True AND
    max_readers=2 AND per-chunk shuffle_data, a loader built with
    skip_batches=k must produce exactly the batches a fresh loader produces
    after discarding k — the seeded generator makes the stream reproducible
    and the parquet-metadata jump lands on the same row."""
    paths = _seed_many_files()
    dl_cfg = DataLoaderConfig(
        kind="simple", block_size=2, shuffle_files=True, shuffle_data=True,
        max_readers=2,
    )
    feats = _x_features()
    strategy = get_data_loader_strategy(dl_cfg, ["x"], lambda kind: (lambda df: df))

    def build(skip):
        return get_host_dataloader(
            "train", 0, list(paths), batch_size=8, num_steps=None,
            data_loader_strategy=strategy, features_config=feats,
            fs_config=_fs(), skip_batches=skip,
        )

    full = [b["x"] for b in build(0)]
    assert len(full) >= 10
    k = 7
    skipped_loader = build(k)
    assert skipped_loader.skip_applied
    skipped = [b["x"] for b in skipped_loader]
    assert len(skipped) == len(full) - k
    for a, b in zip(full[k:], skipped):
        np.testing.assert_array_equal(a, b)


def test_o1_resume_skip_refused_with_shuffle_buffer():
    """The shuffle-buffer window mixes rows across the cursor, so request_skip
    must refuse and the caller falls back to replay."""
    paths = _seed_many_files()
    dl_cfg = DataLoaderConfig(
        kind="simple", block_size=2, shuffle_files=False,
        shuffle_buffer_num_mini_batches=2,
    )
    strategy = get_data_loader_strategy(dl_cfg, ["x"], lambda kind: (lambda df: df))
    loader = get_host_dataloader(
        "train", 0, list(paths), batch_size=8, num_steps=None,
        data_loader_strategy=strategy, features_config=_x_features(),
        fs_config=_fs(), skip_batches=3,
    )
    assert not loader.skip_applied


def test_generator_seeded_reproducible_with_threads():
    """shuffle_files order + chunk assembly must reproduce across runs when
    seeded, even with a thread-pool reader (pool.map preserves submission
    order) — the property both resume modes rely on (VERDICT r2 weak #6)."""
    paths = _seed_many_files()
    dl_cfg = DataLoaderConfig(
        kind="simple", block_size=2, shuffle_files=True, shuffle_data=True,
        max_readers=3,
    )
    strategy = get_data_loader_strategy(dl_cfg, ["x"], lambda kind: (lambda df: df))
    runs = []
    for _ in range(2):
        gen = strategy.load("train", 0, list(paths), _fs(), seed=123)
        runs.append([np.asarray(df["x"]) for df in gen])
    assert len(runs[0]) == len(runs[1]) and len(runs[0]) > 1
    for a, b in zip(runs[0], runs[1]):
        np.testing.assert_array_equal(a, b)


def test_process_reader_matches_thread_mode():
    """DataLoaderConfig.process_reader (forked-child producer) yields the
    exact same batch stream as the thread producer — same order, same
    values (fork inherits the built dataset; only numpy batches cross)."""

    def _mk():
        paths = _seed_two_identical_files()
        strategy = get_data_loader_strategy(
            DataLoaderConfig(block_size=1, shuffle_files=False),
            columns=["x"], data_mapper=lambda kind: (lambda df: df),
        )
        gen = strategy.load("train", 0, paths, _fs(), seed=123)
        return GroupedBatchDataset(
            dataframe_generator=gen, features_config=_x_features(),
            batch_size=8, limit=None, drop_remainder=True, columns=None,
            seed=123,
        )

    thread_batches = list(HostDataLoader(_mk(), max_prefetch=2))
    proc_batches = list(
        HostDataLoader(_mk(), max_prefetch=2, process_reader=True)
    )
    assert len(thread_batches) == len(proc_batches) > 0
    for a, b in zip(thread_batches, proc_batches):
        assert sorted(a) == sorted(b)
        for k in a:
            if getattr(a[k], "dtype", None) is not None and a[k].dtype != object:
                np.testing.assert_array_equal(a[k], b[k])
