"""Joint retrieval→ranking PRODUCT path (BASELINE config 4, VERDICT r4 #6):
``configs/joint_train.yaml`` through ``main_training.execute_pipeline`` —
synthetic data gen → LTHM via the real TrainerPipeline → encode → enriched
parquet → ranker via the real TrainerPipeline (+ ablated arm → uplift)."""

import os
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from recommendations_tpu.config.yaml_loader import load_config  # noqa: E402
from recommendations_tpu.pipeline.joint_pipeline import (  # noqa: E402
    JointPipelineConfig,
)


def _load(overrides=None):
    return load_config(
        os.path.join(REPO, "configs", "joint_train.yaml"),
        overrides=overrides,
        search_paths=[os.path.join(REPO, "configs")],
    )


def test_joint_config_validates():
    cfg = _load()
    assert isinstance(cfg, JointPipelineConfig)
    assert cfg.retrieval.model.name == "lthm"
    assert cfg.ranking.model.kind.value == "ranker"
    # the stage-reference composition honors overrides
    assert cfg.retrieval.train.train_steps == 6000
    assert cfg.ranking.train.batch_size == 256
    # the joint ranker consumes both retrieval-space tensor features
    names = [f.name for f in cfg.ranking.model.features.tensor_features]
    assert names == ["user_emb", "item_emb"]
    assert cfg.synth.enabled and cfg.ablation


def test_joint_pipeline_end_to_end_tiny(tmp_path):
    """The full product path at test scale: every stage runs, the uplift
    metric is produced, and the ranking throughput comes from the package
    loader (train_samples_per_sec present in the ranking stage metrics)."""
    from main_training import execute_pipeline

    root = str(tmp_path / "joint")
    cfg = _load(overrides={
        "enriched_dir": f"{root}/enriched",
        "synth": {
            "root": f"{root}/data",
            "users": 96,
            "products": 200,
            "clusters": 4,
            "files_per_date": 2,
            "train_rows": 2048,
            "val_rows": 512,
        },
        "retrieval": {"overrides": {
            "dataset": {
                "filesystem_config": {"local_dir_prefix": f"{root}/data"},
                "path_glob_train": f"{root}/data/clicks/*/*.parquet",
                "path_glob_test": f"{root}/data/clicks/*/part-00000.parquet",
            },
            "train": {
                "train_steps": 12, "epochs": 4, "batch_size": 16,
                "validation_steps": 0, "train_metrics_every_n_steps": 6,
                "val_metrics_every_n_steps": 0,
            },
        }},
        "ranking": {"overrides": {
            "dataset": {
                "filesystem_config": {"local_dir_prefix": f"{root}/data"},
                "path_glob_train": f"{root}/data/impressions/*/*.parquet",
                "path_glob_test": f"{root}/data/impressions_val/*/*.parquet",
            },
            "train": {
                "train_steps": 20, "epochs": 4, "batch_size": 64,
                "validation_steps": 4, "train_metrics_every_n_steps": 10,
                "val_metrics_every_n_steps": 20,
            },
        }},
    })
    metrics = execute_pipeline(cfg)

    # all stages reported
    assert "retrieval" in metrics and "ranking" in metrics
    assert "ranking_ablated" in metrics
    # held-out-user AUC from the REAL trainer's val round, both arms
    assert np.isfinite(metrics["ranking"]["val_auc_click"])
    assert np.isfinite(metrics["ranking_ablated"]["val_auc_click"])
    assert "auc_uplift_click" in metrics
    assert np.isfinite(metrics["auc_uplift_click"])
    # throughput measured by the package loader path, not a bespoke loop
    assert metrics["ranking"]["train_samples_per_sec"] > 0
    # enriched parquet exists with the embedding columns
    import glob

    import pandas as pd

    files = glob.glob(f"{root}/enriched/train/*/*.parquet")
    assert files
    df = pd.read_parquet(files[0])
    assert "user_emb" in df.columns and "item_emb" in df.columns
    assert np.asarray(df["user_emb"].iloc[0]).shape == (32,)
