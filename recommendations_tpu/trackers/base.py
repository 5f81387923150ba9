"""Tracker ABC + registry — reference ``commons/trackers/base.py:16-58``."""

from __future__ import annotations

from typing import Any, ClassVar, Dict, Optional

from pydantic import BaseModel, ConfigDict

trackers_registry: Dict[str, type] = {}


class Tracker(BaseModel):
    model_config = ConfigDict(extra="allow")

    kind: str

    @classmethod
    def __pydantic_init_subclass__(cls, **kwargs: Any) -> None:
        super().__pydantic_init_subclass__(**kwargs)
        kind = cls.model_fields["kind"].default
        if kind is None:
            raise ValueError(f"'kind' default required on tracker {cls}")
        trackers_registry[kind] = cls

    # lifecycle
    def start_run(self, run_id: Optional[str] = None, experiment: Optional[str] = None) -> None:
        pass

    def end_run(self, error: bool = False) -> None:
        pass

    # logging
    def log_params(self, params: Dict[str, Any]) -> None:
        pass

    def log_metrics(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        pass

    def log_artifacts(self, local_dir: str) -> None:
        pass

    def watch(self, model: Any, log_graph: bool = False) -> None:
        pass
