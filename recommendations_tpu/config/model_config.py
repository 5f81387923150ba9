"""Polymorphic model-config base with a kind/name registry.

Rebuild of reference ``commons/configs/model_config.py:13-48``, with the
registry-key defect fixed: the reference's YAML (`kind: "lthm"`,
`name: "torch_lthm_model"`) can never match its enum value `"LTHM"` /
default name `"lthm"` (SURVEY.md §2.5#1).  Here kinds are lowercase strings
and the registry key is ``f"{kind}/{name}"`` of the *subclass defaults*;
lookup is tried with the YAML's (kind, name) and falls back to kind-only
match so configs cannot silently miss the registry.
"""

from __future__ import annotations

import abc
import enum
from typing import Any, ClassVar, Dict, List, Optional

from pydantic import BaseModel, ConfigDict

from recommendations_tpu.features.feature_config import FeaturesConfig, Task


class ModelKind(str, enum.Enum):
    RANKER = "ranker"
    LTHM = "lthm"


model_registry: Dict[str, type] = {}


class ModelConfig(BaseModel, abc.ABC):
    model_config = ConfigDict(arbitrary_types_allowed=True, protected_namespaces=())

    kind: ModelKind
    type: str
    name: str
    version: str = "v1"
    features: FeaturesConfig
    tasks: Optional[List[Task]] = None

    @classmethod
    def __pydantic_init_subclass__(cls, **kwargs: Any) -> None:
        super().__pydantic_init_subclass__(**kwargs)
        kind = cls.model_fields["kind"].default
        name = cls.model_fields["name"].default
        if kind is None or name is None:
            raise ValueError(f"'kind' and 'name' defaults required on {cls}")
        model_registry[f"{kind.value}/{name}"] = cls

    @classmethod
    def resolve(cls, kind: str, name: str) -> type:
        key = f"{kind}/{name}"
        if key not in model_registry:
            # model packages self-register on import (checked per-key: a
            # partially-populated registry — e.g. only LTHM imported so far —
            # must still trigger the ranker import)
            import importlib

            for pkg in ("recommendations_tpu.models.lthm", "recommendations_tpu.models.ranker"):
                try:
                    importlib.import_module(pkg)
                except ImportError:
                    pass
        if key in model_registry:
            return model_registry[key]
        matches = [v for k, v in model_registry.items() if k.startswith(f"{kind}/")]
        if len(matches) == 1:
            return matches[0]
        raise KeyError(
            f"No model config registered for {key}; known: {sorted(model_registry)}"
        )

    @abc.abstractmethod
    def get_builder(self, stats: Optional[Any] = None):
        """Return a ModelBuilder producing the BaseModelWrapper."""

    # ----- data-preprocessing hooks (reference model_config.py:44-48,
    # models/lthm/config.py:65-77) -------------------------------------------

    def custom_data_preprocessor(self, df, kind: str = "train"):
        return df

    def special_data_prepreprocessor(self, df, kind: str = "train"):
        return df

    def preprocess_fn(self, kind: str = "train"):
        """pre-hook → feature transformers → post-hook, per file."""

        def _fn(df):
            df = self.special_data_prepreprocessor(df, kind)
            df = self.features.default_data_mapper(df)
            df = self.custom_data_preprocessor(df, kind)
            return df

        return _fn
