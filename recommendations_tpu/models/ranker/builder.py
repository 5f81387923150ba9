"""Ranker builder (the reference's ``models/ranker/builder.py`` is empty)."""

from __future__ import annotations

from typing import Any, Optional

from recommendations_tpu.models.ranker.config import RankerModelConfig
from recommendations_tpu.models.ranker.wrapper import RankerModelWrapper
from recommendations_tpu.pipeline.model_builder import ModelBuilder


class RankerModelBuilder(ModelBuilder):
    def __init__(self, stats: Optional[Any], model_config: RankerModelConfig):
        super().__init__(stats)
        self.model_config = model_config

    def build(self) -> RankerModelWrapper:
        return RankerModelWrapper(self.model_config, self.stats)
