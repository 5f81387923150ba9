"""End-to-end trainer loop + checkpoint/resume (VERDICT r1 item 3).

Drives ``TrainerPipeline.execute()`` on FakeDataStore with a tiny LTHM
config, interrupts after train_steps=6 (checkpoints at 3 and 6), then
re-executes with train_steps=12: the run must restore from step 6, fast-
forward the data iterator to the checkpointed mid-epoch position, and
continue to exactly 12 — locking in loop + Orbax round-trip + data-iterator
state (the reference never saves optimizer/step state: 'FIXME load the best
checkpoint', accelerate_training_strategy.py:99).
"""

import glob
import json
import os

import numpy as np
import pytest

from recommendations_tpu.config.pipeline_config import TrainerPipelineConfig
from recommendations_tpu.data.data_store import FakeDataStore
from recommendations_tpu.data.generator import get_data_loader_strategy
from recommendations_tpu.pipeline.trainer_pipeline import TrainerPipeline
from recommendations_tpu.tools.synth_data import make_click_log, _pad_lists
from recommendations_tpu.train.strategy import get_training_strategy

HIST = 12


def _seed_store(num_files=4):
    FakeDataStore.reset()
    for date in ["20240101", "20240102"]:
        for p in range(num_files):
            df = _pad_lists(
                make_click_log(
                    num_users=24, history_len=HIST, num_products=200, seed=p
                ),
                HIST,
            )
            FakeDataStore.put_table(f"clicks/date={date}/part-{p}.parquet", df)


def _pipeline_config(tmp_path, train_steps, ckpt_every=3, shuffle=False):
    model = {
        "kind": "lthm",
        "name": "lthm",
        "log_q_config": {"num_buckets": 1024, "hash_offsets": [0, 7]},
        "context_width": 8,
        "lookahead": [0, 2],
        "metrics_k_all": [1, 5],
        "train_mini_batch_size": -1,
        "lr": 1e-3,
        "product_tower": {
            "inp_emb_dim": 8,
            "out_emb_dim": 16,
            "product_emb_dim": 8,
            "norm_bins": 4,
            "cosine_lsh_config": [{"num_bins": 4, "num_proj": 4}],
            "latent_model_config": {
                "vocab_size_latent": 2048,
                "num_shifts_latent": 2,
                "normalize_embedding": True,
            },
        },
        "transformer_config": {
            "rotator_config": {"ff_mult": 2},
            "is_causal": True,
            "num_layers": 1,
            "attn_config": {
                "n_head": 2, "n_embd": 16, "attn_type": "multi_query",
                "dropout": 0.0, "attn_dropout": 0.0, "bias": False,
            },
        },
        "features": {
            "defaults": {
                "categorical_features": {
                    "default_dtype": "string",
                    "transform_value_to_lowercase": False,
                    "value_to_number_mapper": {"kind": "xxhash"},
                },
                "categorical_history_features": {"default_dtype": "string_list"},
            },
            "categorical_features": [
                {"name": "product_id", "kind": "categorical", "tower_name": "other"},
            ],
            "categorical_history_features": [
                {
                    "name": "product_ids",
                    "kind": "categorical_history",
                    "tower_name": "other",
                    "history_length": HIST,
                    "history_id_feature_name": "product_id",
                    "value_to_number_mapper": {"kind": "xxhash"},
                }
            ],
            "tensor_list_features": [
                {"name": "labels", "kind": "tensor_list", "tower_name": "other",
                 "shape": [HIST], "source": {"kind": "input", "dtype": "tensor_list"}},
                {"name": "timestamps", "kind": "tensor_list", "tower_name": "other",
                 "shape": [HIST], "source": {"kind": "input", "dtype": "tensor_list"}},
            ],
        },
    }
    return TrainerPipelineConfig(
        model=model,
        model_version="resume_test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        dataset={
            "filesystem_config": {"kind": "fake", "path_template": "clicks/date={date}"},
            "train_data_end_date": "20240101",
            "train_period_in_days": 1,
            "val_data_start_date": "20240102",
            "val_period_in_days": 1,
        },
        train={
            "batch_size": 8,
            "train_steps": train_steps,
            "epochs": 4,
            "train_metrics_every_n_steps": 2,
            "val_metrics_every_n_steps": 0,
            "validation_steps": 0,
            "checkpoint_every_k_steps": ckpt_every,
        },
        data_loader={
            "kind": "simple", "block_size": 2,
            "shuffle_files": shuffle, "shuffle_data": shuffle,
            "max_readers": 2 if shuffle else 1,
        },
        eval={"skip_eval": True},
        inference={"skip_inference": True},
        export=None,
        training_strategy={"name": "pjit", "mesh_data": -1},
        trackers={"trackers": []},
    )


def _run(cfg):
    builder = cfg.model.get_builder()
    dls = get_data_loader_strategy(
        cfg.data_loader,
        columns=cfg.model.features.get_input_columns(),
        data_mapper=cfg.model.preprocess_fn,
    )
    ts = get_training_strategy(cfg.training_strategy)
    return TrainerPipeline(cfg, builder, ts, dls).execute()


def test_trainer_pipeline_checkpoint_resume(tmp_path):
    _seed_store()

    # run 1: interrupted at step 6 (checkpoints at 3 and 6)
    cfg1 = _pipeline_config(tmp_path, train_steps=6)
    m1 = _run(cfg1)
    assert m1["train_steps_total"] == 6

    ckpt_root = str(tmp_path / "ckpt")
    steps = sorted(
        int(os.path.basename(p)) for p in glob.glob(os.path.join(ckpt_root, "[0-9]*"))
    )
    assert steps and steps[-1] == 6

    # the data-iterator position rode along with the state
    from recommendations_tpu.train.checkpoint import CheckpointManager
    from recommendations_tpu.train.train_state import TrainState  # noqa: F401

    # run 2: same config, higher step budget — must resume from 6, fast-
    # forward the iterator, and run exactly 6 more steps
    cfg2 = _pipeline_config(tmp_path, train_steps=12)
    m2 = _run(cfg2)
    assert m2["train_steps_total"] == 12
    assert np.isfinite(m2.get("loss", m2.get("total_loss", 0.0)))

    steps2 = sorted(
        int(os.path.basename(p)) for p in glob.glob(os.path.join(ckpt_root, "[0-9]*"))
    )
    assert steps2[-1] == 12
    # resumed run saved checkpoints only for NEW steps (9, 12) — it did not
    # re-run 1..6
    assert all(s > 6 for s in steps2 if s not in steps)


def test_trainer_pipeline_fresh_run_no_checkpoint_dir(tmp_path):
    """Without checkpoint_every_k_steps the pipeline still trains."""
    _seed_store(num_files=2)
    cfg = _pipeline_config(tmp_path, train_steps=4, ckpt_every=None)
    cfg.checkpoint_dir = None
    m = _run(cfg)
    assert m["train_steps_total"] == 4


def test_trainer_resume_o1_skip_under_shuffle(tmp_path, caplog):
    """Resume with shuffle_files=True + max_readers=2 (VERDICT r2 #5): the
    restart must take an O(1) path — the iterator-state snapshot (preferred;
    covers grouped/shuffled pipelines too, VERDICT r3 #6) or the metadata
    row-skip — never the O(steps) replay."""
    _seed_store()
    cfg1 = _pipeline_config(tmp_path, train_steps=6, shuffle=True)
    m1 = _run(cfg1)
    assert m1["train_steps_total"] == 6

    import logging

    with caplog.at_level(logging.INFO, logger="recommendations_tpu.train.strategy"):
        cfg2 = _pipeline_config(tmp_path, train_steps=12, shuffle=True)
        m2 = _run(cfg2)
    assert m2["train_steps_total"] == 12
    assert np.isfinite(m2.get("loss", m2.get("total_loss", 0.0)))
    o1 = [
        r.message
        for r in caplog.records
        if "metadata skip" in r.message or "data-iterator snapshot" in r.message
    ]
    assert o1, [r.message for r in caplog.records]
    assert not any("(replay)" in r.message for r in caplog.records)
