from recommendations_tpu.config.model_config import ModelConfig, ModelKind, model_registry
from recommendations_tpu.config.trainer_config import (
    FileSystemConfig,
    FileSystemKind,
    TrainDatasetConfig,
    ModelTrainConfig,
    ModelEvalConfig,
    ModelExportConfig,
    ModelInferenceConfig,
    DataLoaderConfig,
)
from recommendations_tpu.config.training_strategy_config import (
    TrainingStrategyConfig,
    training_strategy_registry,
    PjitTrainingStrategyConfig,
)
from recommendations_tpu.config.pipeline_config import TrainerPipelineConfig
from recommendations_tpu.config.yaml_loader import load_config, compose_config
