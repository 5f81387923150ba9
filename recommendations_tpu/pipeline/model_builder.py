"""Model-builder seam — reference ``commons/pipeline/model_builder.py:7-13``."""

from __future__ import annotations

import abc
from typing import Any, Optional

from recommendations_tpu.models.base import BaseModelWrapper


class ModelBuilder(abc.ABC):
    def __init__(self, stats: Optional[Any] = None):
        self.stats = stats

    @abc.abstractmethod
    def build(self) -> BaseModelWrapper:
        ...
