from recommendations_tpu.train.train_state import TrainState
from recommendations_tpu.train.optimizers import build_optimizer
from recommendations_tpu.train.strategy import (
    TrainingStrategy,
    PjitTrainingStrategy,
    get_training_strategy,
)
from recommendations_tpu.train.checkpoint import CheckpointManager
