"""Golden run of the PROD config (`configs/lthm_train.yaml`) on real hardware.

VERDICT r1 item 10: the tiny config is proven end-to-end; this drives the
prod-shaped one — 16 layers, d=512, MQA-32, history 768 → context 512,
rel-pos bias, 10M-row KShift table, logQ 2^24 — through the REAL pipeline
(yaml compose → pydantic validate → build → pjit train loop → checkpoint →
export gate) for a handful of steps on the actual chip.

Only run-harness knobs are overridden (data location, step counts, output
dirs); every model/feature/strategy field comes from the yaml unchanged.

Usage:  python tools_golden_run.py [--steps 15] [--shard-rows]
Writes: /tmp/lthm_golden/metrics.json + stdout summary.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import argparse
import json
import os
import shutil
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--history", type=int, default=768)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--users-per-file", type=int, default=320)
    ap.add_argument(
        "--shard-rows", action="store_true",
        help="shard_embedding_rows=true (needs mesh_model>1, i.e. >1 chip)",
    )
    args = ap.parse_args()

    import recommendations_tpu  # noqa: F401
    from recommendations_tpu.tools.synth_data import write_synthetic_dataset

    data_root = "/tmp/lthm_golden/data"
    out_root = "/tmp/lthm_golden/out"
    for d in (data_root, out_root):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    t0 = time.time()
    write_synthetic_dataset(
        data_root,
        dates=["20240101", "20240102"],
        files_per_date=args.files,
        users_per_file=args.users_per_file,
        history_len=args.history,
        num_products=20_000,
    )
    print(f"synthetic data written in {time.time() - t0:.1f}s")

    from recommendations_tpu.config.yaml_loader import load_config
    from main_training import execute_pipeline, CONFIG_ROOT

    overrides = {
        "dataset": {
            "path_glob_train": f"{data_root}/date=20240101/*.parquet",
            "path_glob_test": f"{data_root}/date=20240102/*.parquet",
        },
        "checkpoint_dir": f"{out_root}/ckpt",
        "train": {
            "train_steps": args.steps,
            "checkpoint_every_k_steps": max(args.steps // 3, 1),
            "train_metrics_every_n_steps": 5,
            "val_metrics_every_n_steps": max(args.steps - 1, 1),
            "validation_steps": 2,
        },
        "export": {"filesystem_config": {"local_dir_prefix": f"{out_root}/export"}},
        "trackers": {"trackers": [{"kind": "console"}]},
    }
    if args.shard_rows:
        overrides["model"] = {"shard_embedding_rows": True}
        overrides["training_strategy"] = {"mesh_model": 2}

    cfg = load_config(
        CONFIG_ROOT / "lthm_train.yaml",
        overrides=overrides,
        search_paths=[str(CONFIG_ROOT)],
    )
    # golden-run shape assertions: the yaml really is the prod scale point
    tc = cfg.model.transformer_config
    assert tc.num_layers == 16 and tc.attn_config.n_head == 32
    assert cfg.model.context_width == 512
    assert cfg.model.product_tower.latent_model_config.vocab_size_latent == 10_000_000
    assert cfg.model.log_q_config.num_buckets == 2**24

    t1 = time.time()
    metrics = execute_pipeline(cfg)
    elapsed = time.time() - t1

    out = {
        "config": "lthm_train.yaml",
        "steps": args.steps,
        "elapsed_s": round(elapsed, 1),
        "metrics": {
            k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))
        },
    }
    with open("/tmp/lthm_golden/metrics.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    loss_keys = [k for k in metrics if "loss" in k.lower()]
    assert loss_keys, f"no loss metric in {sorted(metrics)}"
    print("golden run OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
