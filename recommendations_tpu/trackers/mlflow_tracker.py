"""MLflow tracker — reference ``commons/trackers/mlflow_tracker.py:19-93``.

Gated: mlflow is not a hard dependency; the tracker degrades to a logged
warning when the package is absent (it is absent in the TPU test image).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

from recommendations_tpu.trackers.base import Tracker

logger = logging.getLogger(__name__)

try:
    import mlflow  # type: ignore

    _HAVE_MLFLOW = True
except ImportError:
    mlflow = None
    _HAVE_MLFLOW = False


class MlflowTracker(Tracker):
    kind: str = "mlflow"
    tracking_uri: Optional[str] = None
    experiment_name: str = "default"

    def start_run(self, run_id: Optional[str] = None, experiment: Optional[str] = None) -> None:
        if not _HAVE_MLFLOW:
            logger.warning("mlflow not installed; MlflowTracker is a no-op")
            return
        if self.tracking_uri:
            mlflow.set_tracking_uri(self.tracking_uri)
        name = experiment or self.experiment_name
        exp = mlflow.get_experiment_by_name(name)
        exp_id = exp.experiment_id if exp else mlflow.create_experiment(name)
        # resume-by-run_id semantics (reference mlflow_tracker.py:41-55)
        try:
            mlflow.start_run(run_id=run_id, experiment_id=exp_id)
        except Exception:
            mlflow.start_run(experiment_id=exp_id, run_name=run_id)

    def end_run(self, error: bool = False) -> None:
        if not _HAVE_MLFLOW:
            return
        mlflow.end_run(status="FAILED" if error else "FINISHED")

    def log_params(self, params: Dict[str, Any]) -> None:
        if not _HAVE_MLFLOW:
            return
        for k, v in params.items():
            try:
                mlflow.log_param(k, v)
            except Exception:
                pass

    def log_metrics(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        if not _HAVE_MLFLOW:
            return
        clean = {k: float(v) for k, v in metrics.items() if _is_number(v)}
        mlflow.log_metrics(clean, step=step)

    def log_artifacts(self, local_dir: str) -> None:
        if not _HAVE_MLFLOW:
            return
        mlflow.log_artifacts(local_dir)


def _is_number(v: Any) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
