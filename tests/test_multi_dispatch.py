"""Multi-step dispatch (ModelTrainConfig.steps_per_dispatch): k train steps
per jit call via lax.scan over leading-stacked batches.

Parity property: the scanned body splits state.rng exactly like k single
dispatches, so with a deterministic loader the k=2 run must reproduce the
k=1 run's final loss (bit-comparable math, identical batch order)."""

import numpy as np

from recommendations_tpu.config.pipeline_config import TrainerPipelineConfig
from recommendations_tpu.data.data_store import FakeDataStore


def _run(steps_per_dispatch: int, train_steps: int = 5):
    from recommendations_tpu.data.generator import get_data_loader_strategy
    from recommendations_tpu.pipeline.trainer_pipeline import TrainerPipeline
    from recommendations_tpu.tools.synth_data import _pad_lists, make_click_log
    from recommendations_tpu.train.strategy import get_training_strategy

    HIST = 12
    FakeDataStore.reset()
    for p in range(2):
        df = _pad_lists(
            make_click_log(num_users=24, history_len=HIST, num_products=200,
                           seed=p),
            HIST,
        )
        FakeDataStore.put_table(f"clicks/date=20240101/part-{p}.parquet", df)

    model = {
        "kind": "lthm", "name": "lthm",
        "log_q_config": {"num_buckets": 1024, "hash_offsets": [0, 7]},
        "context_width": 8, "lookahead": [0, 2], "metrics_k_all": [1, 5],
        "train_mini_batch_size": -1, "lr": 1e-2,
        "product_tower": {
            "inp_emb_dim": 8, "out_emb_dim": 16, "product_emb_dim": 8,
            "norm_bins": 4,
            "cosine_lsh_config": [{"num_bins": 4, "num_proj": 4}],
            "latent_model_config": {
                "vocab_size_latent": 2048, "num_shifts_latent": 2,
                "normalize_embedding": True,
            },
        },
        "transformer_config": {
            "rotator_config": {"ff_mult": 2}, "is_causal": True,
            "num_layers": 1,
            "attn_config": {"n_head": 2, "n_embd": 16,
                            "attn_type": "multi_query", "dropout": 0.0,
                            "attn_dropout": 0.0, "bias": False},
        },
        "compute_dtype": "float32",
        "features": {
            "defaults": {
                "categorical_features": {
                    "default_dtype": "string",
                    "value_to_number_mapper": {"kind": "xxhash"}},
                "categorical_history_features": {
                    "default_dtype": "string_list"},
            },
            "categorical_features": [
                {"name": "product_id", "kind": "categorical"}],
            "categorical_history_features": [{
                "name": "product_ids", "kind": "categorical_history",
                "history_length": HIST,
                "history_id_feature_name": "product_id",
                "value_to_number_mapper": {"kind": "xxhash"}}],
            "tensor_list_features": [
                {"name": n, "kind": "tensor_list", "shape": [HIST]}
                for n in ("labels", "timestamps")],
        },
    }
    cfg = TrainerPipelineConfig(
        model=model, model_version=f"md_{steps_per_dispatch}",
        checkpoint_dir=None,
        dataset={"filesystem_config": {"kind": "fake",
                                       "path_template": "clicks/date={date}"},
                 "train_data_end_date": "20240101", "train_period_in_days": 1,
                 "val_data_start_date": "20240101", "val_period_in_days": 1},
        train={"batch_size": 8, "train_steps": train_steps, "epochs": 1,
               "train_metrics_every_n_steps": 2,
               "val_metrics_every_n_steps": 0, "validation_steps": 0,
               "checkpoint_every_k_steps": 0,
               "steps_per_dispatch": steps_per_dispatch},
        data_loader={"kind": "simple", "block_size": 1,
                     "shuffle_files": False, "shuffle_data": False},
        eval={"skip_eval": True}, inference={"skip_inference": True},
        export=None,
        training_strategy={"name": "pjit", "mesh_data": -1},
        trackers={"trackers": []},
    )
    builder = cfg.model.get_builder()
    dls = get_data_loader_strategy(
        cfg.data_loader, columns=cfg.model.features.get_input_columns(),
        data_mapper=cfg.model.preprocess_fn,
    )
    ts = get_training_strategy(cfg.training_strategy)
    pipe = TrainerPipeline(cfg, builder, ts, dls)
    metrics = pipe.execute()
    _, state = pipe._trained
    return metrics, state


def test_multi_dispatch_matches_single_step():
    """k=2 reproduces the k=1 run batch-for-batch: the scanned body splits
    state.rng exactly like consecutive single dispatches. train_steps
    rounds UP to a whole dispatch group (documented: stop lands within k-1
    steps past the target), so k=1 runs 6 steps to compare."""
    m1, s1 = _run(1, train_steps=6)
    m2, s2 = _run(2, train_steps=5)  # rounds up to 6
    assert m1["train_steps_total"] == 6
    assert m2["train_steps_total"] == 6
    assert np.isfinite(m2["train_loss"])
    np.testing.assert_allclose(
        m2["train_loss"], m1["train_loss"], rtol=1e-5
    )
    # final device step counters agree
    assert int(np.asarray(s1.step)) == int(np.asarray(s2.step)) == 6


def test_stack_step_groups_tail():
    from recommendations_tpu.data.loader import stack_step_groups

    batches = [{"x": np.full((4,), i)} for i in range(5)]
    out = list(stack_step_groups(iter(batches), 2))
    tags = [t for t, _ in out]
    assert tags == ["multi", "multi", "single"]
    assert out[0][1]["x"].shape == (2, 4)
    np.testing.assert_array_equal(out[0][1]["x"][1], np.full((4,), 1))
    np.testing.assert_array_equal(out[2][1]["x"], np.full((4,), 4))
