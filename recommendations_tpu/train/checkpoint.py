"""Orbax checkpointing with full train-state resume.

Replaces the reference's two checkpoint paths (end-of-epoch Ray
``TorchCheckpoint`` + rank-0 TorchScript export,
``accelerate_training_strategy.py:259-266,374-398``) and fixes its biggest
gap: the reference never saves optimizer/step state ('FIXME load the best
checkpoint', ``:99``).  Here a checkpoint is the complete TrainState
(params, constants, optimizer state, model aux state, step, rng), so a
restart resumes exactly.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from recommendations_tpu.train.train_state import TrainState

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None) -> None:
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
            ),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> Optional[TrainState]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template)),
        )
        return restored["state"]

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
