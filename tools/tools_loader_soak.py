"""Data-pipeline soak: sustained host-loader throughput at multi-date scale.

VERDICT r3 #8: the loader numbers came from small synthetic path sets;
nothing exercised date-windowed multi-date resolution + block chunking at a
few hundred files with throughput sustained over a long window. This tool:

1. writes a date-partitioned synthetic store (default 8 dates x 32 files),
2. resolves train paths through the real date-window logic
   (``data/paths.get_train_data_paths``),
3. streams the full host pipeline (parquet -> mapper -> grouper/batcher ->
   prefetch thread) repeatedly for ``--minutes``, cycling epochs with the
   epoch-seeded loaders,
4. reports per-minute examples/s and RSS so leaks/degradation are visible.

Host-only (no device): measures the input pipeline itself. Writes one JSON
line at the end + a per-minute trace to stdout.

Usage: python tools_loader_soak.py [--minutes 30] [--dates 8] [--files 32]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import argparse
import json
import os
import resource
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--dates", type=int, default=8)
    ap.add_argument("--files", type=int, default=32, help="files per date")
    ap.add_argument("--users", type=int, default=512, help="users per file")
    ap.add_argument("--hist", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--root", default="/tmp/loader_soak")
    args = ap.parse_args()

    import recommendations_tpu  # noqa: F401
    from recommendations_tpu.config.trainer_config import (
        DataLoaderConfig, FileSystemConfig, TrainDatasetConfig,
    )
    from recommendations_tpu.config.yaml_loader import load_config
    from recommendations_tpu.data.generator import get_data_loader_strategy
    from recommendations_tpu.data.loader import get_host_dataloader
    from recommendations_tpu.data.paths import get_train_data_paths
    from recommendations_tpu.tools.synth_data import write_synthetic_dataset

    data_root = os.path.join(args.root, "data")
    dates = [f"202401{d:02d}" for d in range(1, args.dates + 1)]
    marker = os.path.join(
        data_root, f"_ok_{args.dates}x{args.files}x{args.users}x{args.hist}"
    )
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(args.root, ignore_errors=True)
        t0 = time.time()
        write_synthetic_dataset(
            data_root, dates=dates, files_per_date=args.files,
            users_per_file=args.users, history_len=args.hist,
        )
        open(marker, "w").close()
        print(f"wrote {args.dates * args.files} files in {time.time() - t0:.1f}s")

    # reuse the tiny config's feature schema, pointed at the soak store
    cfg = load_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "lthm_tiny.yaml"),
        overrides={
            "dataset": {
                "filesystem_config": {"kind": "local",
                                      "local_dir_prefix": data_root,
                                      "path_template": "date={date}"},
                "train_data_end_date": dates[-1],
                "train_period_in_days": args.dates,
            },
            "data_loader": {"block_size": 4, "max_readers": 2,
                            "shuffle_files": True, "shuffle_data": True},
            "model": {"context_width": args.hist - 8,
                      "features": {"categorical_history_features": [{
                          "name": "product_ids", "kind": "categorical_history",
                          "tower_name": "other", "history_length": args.hist,
                          "history_id_feature_name": "product_id",
                          "value_to_number_mapper": {"kind": "xxhash"}}],
                          "tensor_list_features": [
                              {"name": n, "kind": "tensor_list",
                               "tower_name": "other", "shape": [args.hist]}
                              for n in ("labels", "timestamps")]}},
        },
    )
    paths = get_train_data_paths(cfg.dataset)
    print(f"resolved {len(paths)} paths over {args.dates} dates "
          f"(block_size={cfg.data_loader.block_size})")
    assert len(paths) == args.dates * args.files

    dls = get_data_loader_strategy(
        cfg.data_loader,
        columns=cfg.model.features.get_input_columns(),
        data_mapper=cfg.model.preprocess_fn,
    )
    fs = cfg.dataset.filesystem_config

    deadline = time.time() + args.minutes * 60.0
    t_start = time.time()
    total_rows = 0
    minute_rows = 0
    minute_t0 = t_start
    trace = []
    epoch = 0
    while time.time() < deadline:
        loader = get_host_dataloader(
            kind="train", worker_id=0, paths=list(paths),
            batch_size=args.batch, num_steps=None,
            data_loader_strategy=dls, features_config=cfg.model.features,
            fs_config=fs, epoch=epoch,
        )
        for batch in loader:
            n = len(next(iter(batch.values())))
            total_rows += n
            minute_rows += n
            now = time.time()
            if now - minute_t0 >= 60.0:
                rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
                rate = minute_rows / (now - minute_t0)
                trace.append({"minute": len(trace) + 1,
                              "examples_per_sec": round(rate, 1),
                              "max_rss_gb": round(rss_gb, 3),
                              "epoch": epoch})
                print(json.dumps(trace[-1]), flush=True)
                minute_rows = 0
                minute_t0 = now
            if now >= deadline:
                break
        epoch += 1

    elapsed = time.time() - t_start
    rates = [t["examples_per_sec"] for t in trace] or [total_rows / elapsed]
    first_half = rates[: max(1, len(rates) // 2)]
    second_half = rates[len(rates) // 2:] or first_half
    result = {
        "metric": "loader_soak_examples_per_sec",
        "value": round(total_rows / elapsed, 1),
        "unit": "examples/s (host pipeline only)",
        "minutes": round(elapsed / 60.0, 1),
        "epochs_cycled": epoch,
        "files": len(paths),
        "first_half_mean": round(sum(first_half) / len(first_half), 1),
        "second_half_mean": round(sum(second_half) / len(second_half), 1),
        "max_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(args.root, "result.json"), "w") as f:
        json.dump({"trace": trace, "summary": result}, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
