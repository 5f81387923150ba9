"""Root pipeline config: registry-driven polymorphic assembly.

Rebuild of reference ``commons/configs/trainer_pipeline_config.py:21-59``:
the ``model`` section dispatches on (kind, name) through ``model_registry``,
``training_strategy`` on name through ``training_strategy_registry``, and
``trackers`` through the tracker registry; ``model_version`` / ``run_id``
are generated when absent.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

from pydantic import BaseModel, ConfigDict

from recommendations_tpu.config.model_config import ModelConfig
from recommendations_tpu.config.trainer_config import (
    DataLoaderConfig,
    ModelEvalConfig,
    ModelExportConfig,
    ModelInferenceConfig,
    ModelTrainConfig,
    TrainDatasetConfig,
)
from recommendations_tpu.config.training_strategy_config import (
    PjitTrainingStrategyConfig,
    TrainingStrategyConfig,
    training_strategy_registry,
)


class TrainerPipelineConfig(BaseModel):
    model_config = ConfigDict(arbitrary_types_allowed=True, protected_namespaces=())

    platform: str = "tpu"
    model_version: Optional[str] = None
    run_id: Optional[str] = None
    log_verbosity: int = 1
    # Orbax checkpoint directory; with train.checkpoint_every_k_steps set,
    # training saves full TrainState + data-iterator position here and
    # resumes from the latest checkpoint on restart
    checkpoint_dir: Optional[str] = None

    model: ModelConfig
    dataset: TrainDatasetConfig
    train: ModelTrainConfig = ModelTrainConfig()
    eval: Optional[ModelEvalConfig] = ModelEvalConfig()
    inference: ModelInferenceConfig = ModelInferenceConfig()
    export: Optional[ModelExportConfig] = None
    data_loader: DataLoaderConfig = DataLoaderConfig()
    training_strategy: TrainingStrategyConfig = PjitTrainingStrategyConfig()
    trackers: Any = None  # validated lazily to avoid circular import
    stats: Any = None  # StatsConfig; validated lazily

    def __init__(self, **kwargs):
        model_cfg = kwargs.get("model")
        if isinstance(model_cfg, dict):
            cls = ModelConfig.resolve(
                str(model_cfg.get("kind", "")), str(model_cfg.get("name", ""))
            )
            kwargs["model"] = cls(**model_cfg)

        ts = kwargs.get("training_strategy")
        if isinstance(ts, dict):
            name = ts.get("name", "pjit")
            ts_cls = training_strategy_registry.get(name)
            if ts_cls is None:
                raise KeyError(
                    f"Unknown training strategy '{name}'; known: {sorted(training_strategy_registry)}"
                )
            kwargs["training_strategy"] = ts_cls(**ts)

        st = kwargs.get("stats")
        if isinstance(st, dict):
            from recommendations_tpu.pipeline.stats import StatsConfig

            kwargs["stats"] = StatsConfig(**st)

        trackers = kwargs.get("trackers")
        if trackers is None or isinstance(trackers, dict):
            from recommendations_tpu.trackers.facade import TrainingTrackersConfig

            kwargs["trackers"] = TrainingTrackersConfig(**(trackers or {}))

        if not kwargs.get("model_version"):
            kwargs["model_version"] = str(int(time.time()))
        if not kwargs.get("run_id"):
            kwargs["run_id"] = f"run_{kwargs['model_version']}"
        super().__init__(**kwargs)
