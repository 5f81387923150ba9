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

    def save(
        self,
        step: int,
        state: TrainState,
        metrics: Optional[dict] = None,
        data_iter_state: Optional[dict] = None,
    ) -> None:
        """Save the full TrainState plus (optionally) the host data-iterator
        position (epoch + batches consumed), so a restart resumes mid-epoch
        instead of silently replaying data (SURVEY §5 checkpoint plan)."""
        items = {"state": ocp.args.StandardSave(state)}
        if data_iter_state is not None:
            items["data_iter"] = ocp.args.JsonSave(dict(data_iter_state))
        self._mgr.save(
            step,
            args=ocp.args.Composite(**items),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(
        self, state_template: TrainState, step: Optional[int] = None
    ) -> Optional[tuple]:
        """Returns (TrainState, data_iter_state dict) or None if no checkpoint."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        items = {"state": ocp.args.StandardRestore(state_template)}
        has_data_iter = False
        try:
            meta = self._mgr.item_metadata(step)
            has_data_iter = "data_iter" in getattr(meta, "keys", lambda: [])() or (
                hasattr(meta, "data_iter") and meta.data_iter is not None
            )
        except Exception:
            has_data_iter = False
        if has_data_iter:
            items["data_iter"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**items))
        data_iter = restored.get("data_iter") if has_data_iter else None
        return restored["state"], dict(data_iter or {})

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
