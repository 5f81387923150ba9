"""Golden-config tests: every shipped YAML must compose, validate, and build
its model (SURVEY.md §4 — 'this alone would have caught defects 1-7')."""

import glob
import os

import pytest

from recommendations_tpu.config.yaml_loader import (
    compose_config,
    load_config,
    parse_cli_overrides,
)

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
TOP_LEVEL = sorted(
    p for p in glob.glob(os.path.join(CONFIG_ROOT, "*.yaml"))
)


@pytest.mark.parametrize("path", TOP_LEVEL, ids=[os.path.basename(p) for p in TOP_LEVEL])
def test_config_validates_and_builds(path):
    cfg = load_config(path, search_paths=[CONFIG_ROOT])
    from recommendations_tpu.pipeline.joint_pipeline import JointPipelineConfig

    if isinstance(cfg, JointPipelineConfig):
        # two-stage config: both stage models must build
        stages = [cfg.retrieval, cfg.ranking]
    else:
        assert cfg.model_version
        stages = [cfg]
    for stage in stages:
        wrapper = stage.model.get_builder(stats=None).build()
        assert wrapper is not None
        # the feature system must have compiled transformers
        assert stage.model.features.get_input_columns()


def test_overrides_and_interpolation():
    overrides = parse_cli_overrides(["train.train_steps=7", "model.lr=0.01"])
    cfg = load_config(
        os.path.join(CONFIG_ROOT, "lthm_tiny.yaml"),
        overrides=overrides,
        search_paths=[CONFIG_ROOT],
    )
    assert cfg.train.train_steps == 7
    assert cfg.model.lr == 0.01
    # ${datestr} interpolation resolved
    assert cfg.dataset.train_data_end_date == "20240101"


def test_resolvers():
    data = compose_config(os.path.join(CONFIG_ROOT, "lthm_train.yaml"), search_paths=[CONFIG_ROOT])
    # day_before_days resolves to a YYYYMMDD string
    assert len(data["datestr"]) == 8 and data["datestr"].isdigit()
    assert data["run_id"].startswith("run_")


def test_no_eval_resolver():
    """The reference's ${eval:} python-eval resolver (SURVEY.md §2.5#16) must
    not exist."""
    import tempfile, yaml

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write("x: \"${eval: 2 ** 24}\"\n")
        path = f.name
    with pytest.raises(KeyError, match="Unknown resolver"):
        compose_config(path)


def test_min_history_size_filter():
    """LTHM custom_data_preprocessor drops short histories (knob declared but
    unused in the reference)."""
    import numpy as np
    import pandas as pd
    from tests.test_lthm_model import tiny_config

    cfg = tiny_config(min_history_size=3)
    feats_cfg = {
        "defaults": {},
        "categorical_history_features": [
            {"name": "product_ids", "kind": "categorical_history",
             "history_length": 4, "history_id_feature_name": "product_id",
             "source": {"kind": "input", "dtype": "int64_list"}}
        ],
    }
    from recommendations_tpu.features.feature_config import FeaturesConfig

    cfg = cfg.model_copy(update={"features": FeaturesConfig(**feats_cfg)})
    df = pd.DataFrame({
        "product_ids": [[1, 2, 3, 4], [5, 0, 0, 0], [6, 7, 8, 0]],
    })
    fn = cfg.preprocess_fn("train")
    out = fn(df)
    assert len(out) == 2  # the single-event history dropped
