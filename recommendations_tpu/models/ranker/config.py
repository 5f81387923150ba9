"""Ranker (factorized DLRM) config.

The reference declares this model but ships only the config + empty stubs
(``models/ranker/config.py:16-61``; ``fdlrm/*.py`` are 0-byte — SURVEY.md
§M2).  This is the full implementation the reference intended: feature→tower
routing by ``tower_name``, factorized query/product/user interaction, and
multi-task heads.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

from pydantic import ConfigDict

from recommendations_tpu.config.model_config import ModelConfig, ModelKind
from recommendations_tpu.features.feature_config import FeatureKind


class RankerModelConfig(ModelConfig):
    model_config = ConfigDict(arbitrary_types_allowed=True, protected_namespaces=())

    kind: ModelKind = ModelKind.RANKER
    type: str = "factorized_dlrm"
    name: str = "ranker_model"
    emb_dim: int = 64
    # explicit overrides; default routing is by Feature.tower_name
    query_features: Optional[List[str]] = None
    item_features: Optional[List[str]] = None
    user_features: Optional[List[str]] = None

    # architecture knobs
    tower_hidden: Tuple[int, ...] = (256, 128)
    tower_dim: int = 64
    top_hidden: Tuple[int, ...] = (256, 128)
    num_embeddings_default: int = 2**22
    use_qr_embeddings: bool = True
    interaction_self: bool = False  # include self-dots in the pairwise block
    lr: float = 1e-3
    weight_decay: float = 0.0

    def _routed(self, tower: str) -> List[str]:
        feats = (
            self.features.categorical_features
            + self.features.numerical_features
            + self.features.bool_features
            + self.features.timestamp_features
            + self.features.one_hot_string_features
            + self.features.lat_lng_features
            # beyond the reference's list (models/ranker/config.py:29-31):
            # dense tensor features, e.g. upstream LTHM user embeddings
            + self.features.tensor_features
        )
        return [f.name for f in feats if f.tower_name.value == tower]

    @property
    def product_features_list(self) -> List[str]:
        return self.item_features if self.item_features is not None else self._routed("product")

    @property
    def query_features_list(self) -> List[str]:
        return self.query_features if self.query_features is not None else self._routed("query")

    @property
    def user_features_list(self) -> List[str]:
        return self.user_features if self.user_features is not None else self._routed("user")

    @property
    def task_list(self):
        return self.tasks or []

    def get_builder(self, stats: Optional[Any] = None):
        from recommendations_tpu.models.ranker.builder import RankerModelBuilder

        return RankerModelBuilder(stats, self)
