"""LTHM builder — reference ``models/lthm/builder.py:8-14``."""

from __future__ import annotations

from typing import Any, Optional

from recommendations_tpu.models.lthm.config import LTHMModelConfig
from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper
from recommendations_tpu.pipeline.model_builder import ModelBuilder


class LTHMModelBuilder(ModelBuilder):
    def __init__(self, stats: Optional[Any], model_config: LTHMModelConfig):
        super().__init__(stats)
        self.model_config = model_config

    def build(self) -> LTHMModelWrapper:
        return LTHMModelWrapper(self.model_config, self.stats)
