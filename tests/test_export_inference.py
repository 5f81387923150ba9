"""Export round-trip + batch inference (serving-artifact path)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper
from recommendations_tpu.pipeline.export import export_model_artifacts
from recommendations_tpu.train.train_state import TrainState
from tests.test_lthm_model import synth_batch, tiny_config


def _state(wrapper, batch):
    vs = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    return TrainState.create(
        vs.get("params", {}), vs.get("constants", {}), {}, wrapper.init_aux_state(),
        jax.random.PRNGKey(1),
    )


def test_export_roundtrip(tmp_path):
    cfg = tiny_config()
    wrapper = LTHMModelWrapper(cfg)
    batch = synth_batch(b=2, s=16)
    state = _state(wrapper, batch)
    out_before = wrapper.forward(
        {"params": state.params, "constants": state.constants}, batch
    )

    export_model_artifacts(wrapper, state, str(tmp_path), trace_batch=None)
    assert (tmp_path / "config.json").exists()

    # reload the weights and check identical outputs
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(str(tmp_path / "params"))
    out_after = wrapper.forward(restored, batch)
    np.testing.assert_allclose(
        np.asarray(out_before["next_token_emb"]),
        np.asarray(out_after["next_token_emb"]),
        rtol=1e-6,
    )
    # exported config must re-validate into the same model config
    import json
    from recommendations_tpu.models.lthm.config import LTHMModelConfig

    cfg2 = LTHMModelConfig(**json.loads((tmp_path / "config.json").read_text()))
    assert cfg2.context_width == cfg.context_width


def test_stablehlo_export(tmp_path):
    cfg = tiny_config()
    wrapper = LTHMModelWrapper(cfg)
    batch = synth_batch(b=2, s=16)
    state = _state(wrapper, batch)
    export_model_artifacts(
        wrapper, state, str(tmp_path),
        trace_batch={k: np.asarray(v) for k, v in batch.items()},
    )
    path = tmp_path / "user_encoder.stablehlo"
    assert path.exists() and path.stat().st_size > 0

    # deserialize and execute the compiled artifact
    from jax import export as jax_export

    exported = jax_export.deserialize(path.read_bytes())
    variables = {"params": state.params}
    if state.constants:
        variables["constants"] = state.constants
    got = exported.call(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    want = wrapper.inference_models()["user_encoder"](variables, batch)
    np.testing.assert_allclose(
        np.asarray(got["user_emb"]), np.asarray(want["user_emb"]), rtol=1e-5
    )


def test_batch_inference_writes_parquet(tmp_path):
    import pandas as pd

    from recommendations_tpu.config.pipeline_config import TrainerPipelineConfig
    from recommendations_tpu.data.data_store import FakeDataStore
    from recommendations_tpu.pipeline.inference import run_inference
    from recommendations_tpu.tools.synth_data import make_click_log, _pad_lists

    FakeDataStore.reset()
    for p in range(2):
        df = _pad_lists(make_click_log(num_users=8, history_len=16, seed=p), 16)
        FakeDataStore.put_table(f"inf/date=20240102/part-{p}.parquet", df)

    model_cfg = tiny_config()
    # build features matching the 16-len synthetic histories
    from recommendations_tpu.features.feature_config import FeaturesConfig

    feats = FeaturesConfig(
        defaults={
            "categorical_features": {
                "default_dtype": "string",
                "transform_value_to_lowercase": False,
                "value_to_number_mapper": {"kind": "xxhash"},
            },
        },
        categorical_features=[{"name": "product_id", "kind": "categorical"}],
        categorical_history_features=[
            {"name": "product_ids", "kind": "categorical_history",
             "history_length": 16, "history_id_feature_name": "product_id",
             "value_to_number_mapper": {"kind": "xxhash"}}
        ],
        tensor_list_features=[
            {"name": "labels", "kind": "tensor_list", "shape": (16,)},
            {"name": "timestamps", "kind": "tensor_list", "shape": (16,)},
        ],
        extra_input_fields=[
            {"name": "customer_id", "kind": "categorical",
             "do_not_convert_to_platform_type": True,
             "source": {"kind": "input", "dtype": "string"}},
        ],
    )
    model_cfg = model_cfg.model_copy(update={"features": feats})

    cfg = TrainerPipelineConfig(
        model=model_cfg,
        dataset={
            "filesystem_config": {"kind": "fake", "path_template": "inf/date={date}"},
            "val_data_start_date": "20240102",
            "val_period_in_days": 1,
        },
        inference={"num_workers": 1, "inference_batch_size": 8,
                   "skip_inference": False, "max_num_batches": 2},
    )
    wrapper = LTHMModelWrapper(model_cfg)
    batch = synth_batch(b=2, s=16)
    state = _state(wrapper, batch)
    out = run_inference(wrapper, state, cfg, str(tmp_path))
    assert out is not None
    res = pd.read_parquet(out)
    assert len(res) == 16
    assert "user_encoder.user_emb" in res.columns
    emb = np.stack(res["user_encoder.user_emb"].values)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-4)
    assert "customer_id" in res.columns
