"""Fan-out tracker facade with per-tracker exception isolation.

Reference ``commons/configs/tracker_config.py:18-88``: every call is wrapped
per tracker so one failing backend (e.g. MLflow server down) never kills the
training run.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

from pydantic import BaseModel, ConfigDict

from recommendations_tpu.trackers.base import Tracker, trackers_registry

# ensure built-in trackers self-register
from recommendations_tpu.trackers import console as _console  # noqa: F401

logger = logging.getLogger(__name__)


def _flatten(prefix: str, d: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(key, v))
        else:
            out[key] = v
    return out


class TrainingTrackersConfig(BaseModel):
    model_config = ConfigDict(arbitrary_types_allowed=True)

    experiment: Optional[str] = None
    run_id: Optional[str] = None
    trackers: List[Tracker] = []

    def __init__(self, **kwargs):
        raw = kwargs.get("trackers")
        if raw:
            built = []
            for t in raw:
                if isinstance(t, dict):
                    cls = trackers_registry.get(t.get("kind", ""))
                    if cls is None:
                        # late import may register it (e.g. mlflow)
                        if t.get("kind") == "mlflow":
                            from recommendations_tpu.trackers import mlflow_tracker  # noqa: F401

                            cls = trackers_registry.get("mlflow")
                    if cls is None:
                        raise KeyError(f"Unknown tracker kind {t.get('kind')!r}")
                    built.append(cls(**t))
                else:
                    built.append(t)
            kwargs["trackers"] = built
        else:
            kwargs["trackers"] = [trackers_registry["console"]()]
        super().__init__(**kwargs)

    def _each(self, method: str, *args, **kw) -> None:
        for t in self.trackers:
            try:
                getattr(t, method)(*args, **kw)
            except Exception:  # isolation per reference tracker_config.py:40-88
                logger.exception("tracker %s.%s failed", type(t).__name__, method)

    def start_run(self) -> None:
        self._each("start_run", run_id=self.run_id, experiment=self.experiment)

    def end_run(self, error: bool = False) -> None:
        self._each("end_run", error=error)

    def log_params(self, params: Dict[str, Any]) -> None:
        self._each("log_params", params)

    def log_params_flatten(self, prefix: str, params: Dict[str, Any]) -> None:
        self._each("log_params", _flatten(prefix, params))

    def log_metrics(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        self._each("log_metrics", metrics, step=step)

    def log_artifacts(self, local_dir: str) -> None:
        self._each("log_artifacts", local_dir)

    def watch(self, model: Any, log_graph: bool = False) -> None:
        self._each("watch", model, log_graph=log_graph)
