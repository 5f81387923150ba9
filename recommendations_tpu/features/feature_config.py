"""Declarative feature schema → compiled host-side transformer pipeline.

Pydantic rebuild of reference ``commons/configs/feature_config.py`` (the
repo's largest component): 10 feature kinds + ``Task`` heads, per-kind
defaults cascade, subclass registries keyed by ``kind``, and a constructor
that compiles an ordered list of DataFrame transformers (NA fixing →
rename/copy → value transforms → history handling).

Kept verbatim from the reference because it is its best idea (SURVEY.md §5
'config/flag system'); the transform *implementations* are the vectorized
ones in ``recommendations_tpu/features/transforms.py``.
"""

from __future__ import annotations

import enum
import functools
from typing import Any, Callable, ClassVar, Dict, List, Optional, Tuple

import pandas as pd
from pydantic import BaseModel, ConfigDict, Field, field_validator

from recommendations_tpu.features import transforms


class EmbeddingTable(BaseModel):
    num_embeddings: int
    emb_dim: int
    use_qr: bool = False


class CategoricalValueToNumberMapper(BaseModel):
    kind: str
    registry: ClassVar[dict] = {}

    @classmethod
    def __pydantic_init_subclass__(cls, **kwargs: Any) -> None:
        super().__pydantic_init_subclass__(**kwargs)
        kind = cls.model_fields["kind"].default
        if kind is None:
            raise ValueError(f"'kind' default required for mapper subclass {cls}")
        cls.registry[kind] = cls

    @classmethod
    def dispatch(cls, value):
        if isinstance(value, dict):
            sub = cls.registry.get(value.get("kind"))
            if sub is not None:
                return sub(**value)
        return value


class XXHashMapper(CategoricalValueToNumberMapper):
    kind: str = "xxhash"


class NoneMapper(CategoricalValueToNumberMapper):
    kind: str = "none"


# ----- per-kind defaults ----------------------------------------------------


class NumericalFeaturesDefaults(BaseModel):
    embed_feature: Optional[bool] = None


class CategoricalFeaturesDefaults(BaseModel):
    embedding: Optional[EmbeddingTable] = None
    proj_dim: Optional[int] = None
    value_to_number_mapper: Optional[CategoricalValueToNumberMapper] = None
    default_dtype: Optional[str] = None
    transform_value_to_lowercase: Optional[bool] = True

    @field_validator("value_to_number_mapper", mode="before")
    @classmethod
    def _dispatch_mapper(cls, v):
        return CategoricalValueToNumberMapper.dispatch(v)


class CategoricalHistoryFeatureDefaults(CategoricalFeaturesDefaults):
    pass


class TensorFeaturesDefaults(BaseModel):
    emb_dim: Optional[int] = None


class TensorListFeaturesDefaults(BaseModel):
    shape: Optional[Tuple[int, ...]] = None


class BoolFeaturesDefaults(BaseModel):
    emb_dim: Optional[int] = None


class TimestampFeaturesDefaults(BaseModel):
    emb_dim: Optional[int] = None


class LatLongFeaturesDefaults(BaseModel):
    emb_dim: Optional[int] = None


class OneHotStringFeaturesDefaults(BaseModel):
    pass


class EmbeddingTableConfig(BaseModel):
    shared: Optional[Dict[str, EmbeddingTable]] = None
    query: Optional[Dict[str, EmbeddingTable]] = None
    item: Optional[Dict[str, EmbeddingTable]] = None


class FeatureDefaults(BaseModel):
    do_not_fix_na_values: bool = False
    transform_all_feature_names_to_lowercase: bool = True
    embedding_table_config: Optional[EmbeddingTableConfig] = None
    bool_features: Optional[BoolFeaturesDefaults] = None
    numerical_features: Optional[NumericalFeaturesDefaults] = None
    categorical_features: Optional[CategoricalFeaturesDefaults] = None
    categorical_history_features: Optional[CategoricalHistoryFeatureDefaults] = None
    tensor_features: Optional[TensorFeaturesDefaults] = None
    tensor_list_features: Optional[TensorListFeaturesDefaults] = None
    timestamp_features: Optional[TimestampFeaturesDefaults] = None
    lat_lng_features: Optional[LatLongFeaturesDefaults] = None
    one_hot_string_features: Optional[OneHotStringFeaturesDefaults] = None


# ----- sources / kinds ------------------------------------------------------


class FeatureSourceKind(str, enum.Enum):
    INPUT = "input"
    DERIVED = "derived"


class FeatureTowerName(str, enum.Enum):
    QUERY = "query"
    PRODUCT = "product"
    USER = "user"
    CONTEXT = "context"
    OTHER = "other"


class FeatureSource(BaseModel):
    kind: FeatureSourceKind
    dtype: Optional[str] = None
    registry: ClassVar[dict] = {}

    @classmethod
    def __pydantic_init_subclass__(cls, **kwargs: Any) -> None:
        super().__pydantic_init_subclass__(**kwargs)
        kind = cls.model_fields["kind"].default
        if kind is None:
            raise ValueError(f"'kind' default required for source subclass {cls}")
        FeatureSource.registry[kind] = cls

    @classmethod
    def dispatch(cls, value):
        if isinstance(value, dict):
            sub = cls.registry.get(value.get("kind"))
            if sub is not None:
                return sub(**value)
        return value


class InputFeatureSource(FeatureSource):
    kind: FeatureSourceKind = FeatureSourceKind.INPUT
    input_field: Optional[str] = None


class DerivedFeatureSource(FeatureSource):
    kind: FeatureSourceKind = FeatureSourceKind.DERIVED


class FeatureKind(str, enum.Enum):
    Bool = "bool"
    Numerical = "numerical"
    Categorical = "categorical"
    CategoricalList = "categorical_list"
    CategoricalHistory = "categorical_history"
    Tensor = "tensor"
    TensorList = "tensor_list"
    Timestamp = "timestamp"
    LatLong = "latlong"
    OneHotString = "one_hot_string"


class Feature(BaseModel):
    name: str
    kind: FeatureKind
    source: FeatureSource = Field(default_factory=InputFeatureSource)
    do_not_convert_to_platform_type: bool = False
    include_in_eval_output: bool = False
    tower_name: FeatureTowerName = FeatureTowerName.OTHER

    registry: ClassVar[dict] = {}

    @classmethod
    def __pydantic_init_subclass__(cls, **kwargs: Any) -> None:
        super().__pydantic_init_subclass__(**kwargs)
        kind = cls.model_fields["kind"].default
        if kind is None and cls.__name__ != "Task":
            return
        Feature.registry[kind] = cls

    @field_validator("source", mode="before")
    @classmethod
    def _dispatch_source(cls, v):
        return FeatureSource.dispatch(v)

    @classmethod
    def dispatch(cls, value):
        if isinstance(value, dict):
            sub = cls.registry.get(value.get("kind"))
            if sub is not None:
                return sub(**value)
        return value

    def populate_defaults(self, feature_defaults: FeatureDefaults) -> None:
        if isinstance(self.source, InputFeatureSource) and self.source.input_field is None:
            self.source.input_field = self.name
        if (
            feature_defaults.transform_all_feature_names_to_lowercase
            and any(c.isupper() for c in self.name)
            and isinstance(self.source, InputFeatureSource)
        ):
            self.name = self.name.lower()


class Task(Feature):
    """A supervised head (CTR/CVR etc.) — reference ``feature_config.py:220-223``."""

    kind: FeatureKind = FeatureKind.Numerical
    num_labels: int = 1
    weight: float = 1.0
    detached_estimator: bool = False


class BoolFeature(Feature):
    kind: FeatureKind = FeatureKind.Bool
    emb_dim: Optional[int] = None

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        if self.source.dtype is None:
            self.source.dtype = "bool"
        if d.bool_features and d.bool_features.emb_dim is not None and self.emb_dim is None:
            self.emb_dim = d.bool_features.emb_dim


class NumericalFeature(Feature):
    kind: FeatureKind = FeatureKind.Numerical
    embed_feature: Optional[bool] = None

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        if self.source.dtype is None:
            self.source.dtype = "float32"
        if (
            d.numerical_features
            and d.numerical_features.embed_feature is not None
            and self.embed_feature is None
        ):
            self.embed_feature = d.numerical_features.embed_feature


class OneHotStringFeature(Feature):
    kind: FeatureKind = FeatureKind.OneHotString

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        assert self.source.dtype in (None, "one_hot_string")
        self.source.dtype = "one_hot_string"


class CategoricalFeature(Feature):
    kind: FeatureKind = FeatureKind.Categorical
    emb_table_name: Optional[str] = None
    proj_dim: Optional[int] = None
    transform_value_to_lowercase: Optional[bool] = None
    value_to_number_mapper: Optional[CategoricalValueToNumberMapper] = None

    @field_validator("value_to_number_mapper", mode="before")
    @classmethod
    def _dispatch_mapper(cls, v):
        return CategoricalValueToNumberMapper.dispatch(v)

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        defaults = d.categorical_features
        if self.transform_value_to_lowercase is None:
            if defaults is not None and defaults.transform_value_to_lowercase is not None:
                self.transform_value_to_lowercase = defaults.transform_value_to_lowercase
        if self.source.dtype is None:
            if defaults is not None and defaults.default_dtype is not None:
                self.source.dtype = defaults.default_dtype
            else:
                self.source.dtype = (
                    "string_lower" if self.transform_value_to_lowercase else "string"
                )
        if defaults is None:
            return
        if self.value_to_number_mapper is None and defaults.value_to_number_mapper is not None:
            self.value_to_number_mapper = defaults.value_to_number_mapper
        if self.proj_dim is None and defaults.proj_dim is not None:
            self.proj_dim = defaults.proj_dim
        if self.emb_table_name is None and defaults.embedding is not None:
            self.emb_table_name = "default_categorical"


class CategoricalHistoryFeature(Feature):
    kind: FeatureKind = FeatureKind.CategoricalHistory
    emb_table_name: Optional[str] = None
    history_length: int = 20
    history_id_feature_name: str
    value_to_number_mapper: Optional[CategoricalValueToNumberMapper] = None
    remove_history_id_from_history: bool = False

    @field_validator("value_to_number_mapper", mode="before")
    @classmethod
    def _dispatch_mapper(cls, v):
        return CategoricalValueToNumberMapper.dispatch(v)

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        defaults = d.categorical_history_features
        if self.source.dtype is None:
            if defaults is not None and defaults.default_dtype is not None:
                self.source.dtype = defaults.default_dtype
            else:
                self.source.dtype = "string_list"
        if defaults is None:
            return
        if self.value_to_number_mapper is None and defaults.value_to_number_mapper is not None:
            self.value_to_number_mapper = defaults.value_to_number_mapper


class TensorFeature(Feature):
    kind: FeatureKind = FeatureKind.Tensor
    emb_dim: int = 0

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        if self.source.dtype is None:
            self.source.dtype = "tensor"
        if d.tensor_features and d.tensor_features.emb_dim is not None and self.emb_dim == 0:
            self.emb_dim = d.tensor_features.emb_dim

    def get_emb_dim_as_shape(self) -> Tuple[int]:
        return (self.emb_dim,)


class TensorListFeature(Feature):
    kind: FeatureKind = FeatureKind.TensorList
    shape: Tuple[int, ...]

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        if self.source.dtype is None:
            self.source.dtype = "tensor_list"
        if d.tensor_list_features and d.tensor_list_features.shape is not None and self.shape == tuple():
            self.shape = d.tensor_list_features.shape

    def get_shape(self) -> Tuple[int, ...]:
        return self.shape


class TimestampFeature(Feature):
    kind: FeatureKind = FeatureKind.Timestamp
    emb_dim: Optional[int] = None

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        if self.source.dtype is None:
            self.source.dtype = "int64"
        if d.timestamp_features and d.timestamp_features.emb_dim is not None and self.emb_dim is None:
            self.emb_dim = d.timestamp_features.emb_dim


class LatLongFeature(Feature):
    kind: FeatureKind = FeatureKind.LatLong
    emb_dim: Optional[int] = None

    def populate_defaults(self, d: FeatureDefaults) -> None:
        super().populate_defaults(d)
        if self.source.dtype is None:
            self.source.dtype = "float32"
        if d.lat_lng_features and d.lat_lng_features.emb_dim is not None and self.emb_dim is None:
            self.emb_dim = d.lat_lng_features.emb_dim


class GroupDatasetConfig(BaseModel):
    """Session-group formation knobs — reference ``feature_config.py:446-452``."""

    group_by_columns: List[str] = Field(default_factory=list)
    sort_by_columns: List[str] = Field(default_factory=list)
    sort_reverse: bool = True
    flatten: bool = False
    minimum_group_size: int = 0
    maximum_group_size: Optional[int] = None


class FeaturesConfig(BaseModel):
    model_config = ConfigDict(arbitrary_types_allowed=True)

    defaults: FeatureDefaults
    embedding_table_config: EmbeddingTableConfig = Field(default_factory=EmbeddingTableConfig)
    embedding_tables: Dict[str, EmbeddingTable] = Field(default_factory=dict)
    bool_features: List[BoolFeature] = Field(default_factory=list)
    numerical_features: List[NumericalFeature] = Field(default_factory=list)
    one_hot_string_features: List[OneHotStringFeature] = Field(default_factory=list)
    categorical_features: List[CategoricalFeature] = Field(default_factory=list)
    categorical_history_features: List[CategoricalHistoryFeature] = Field(default_factory=list)
    tensor_features: List[TensorFeature] = Field(default_factory=list)
    tensor_list_features: List[TensorListFeature] = Field(default_factory=list)
    timestamp_features: List[TimestampFeature] = Field(default_factory=list)
    lat_lng_features: List[LatLongFeature] = Field(default_factory=list)
    extra_eval_output_fields: List[Feature] = Field(default_factory=list)
    extra_input_fields: List[Feature] = Field(default_factory=list)
    group_dataset: Optional[GroupDatasetConfig] = None

    # compiled in __init__ (excluded from serialization: recomputed on load,
    # and the transformer list holds callables)
    input_columns: List[str] = Field(default_factory=list, exclude=True)
    input_to_feature_map: Dict[str, List[Feature]] = Field(default_factory=dict, exclude=True)
    features_map: Dict[str, Feature] = Field(default_factory=dict, exclude=True)
    dtypes: Dict[str, str] = Field(default_factory=dict, exclude=True)
    dtypes_string_map: Dict[str, str] = Field(default_factory=dict, exclude=True)
    transformers: List[Callable[[pd.DataFrame], None]] = Field(default_factory=list, exclude=True)

    def __init__(self, **kwargs):
        for field in ["extra_eval_output_fields", "extra_input_fields"]:
            if kwargs.get(field) is not None:
                kwargs[field] = [Feature.dispatch(f) for f in kwargs[field]]
        super().__init__(**kwargs)
        self._compile()

    # -- compilation (reference feature_config.py:482-620) -------------------

    def _all_features(self) -> List[Feature]:
        return sum(
            [
                self.bool_features,
                self.numerical_features,
                self.categorical_features,
                self.categorical_history_features,
                self.tensor_features,
                self.tensor_list_features,
                self.timestamp_features,
                self.lat_lng_features,
                self.one_hot_string_features,
                self.extra_eval_output_fields,
                self.extra_input_fields,
            ],
            [],
        )

    def _compile(self) -> None:
        if self.defaults.categorical_features is not None and self.defaults.categorical_features.embedding is not None:
            self.embedding_tables["default_categorical"] = self.defaults.categorical_features.embedding
        if self.defaults.embedding_table_config is not None:
            self.embedding_table_config = self.defaults.embedding_table_config

        input_columns: List[str] = []
        for feature in self._all_features():
            if not isinstance(feature.source, DerivedFeatureSource):
                feature.populate_defaults(self.defaults)
            if isinstance(feature.source, InputFeatureSource):
                input_field = feature.source.input_field
                features = self.input_to_feature_map.get(input_field)
                if features is None:
                    features = []
                    input_columns.append(input_field)
                else:
                    existing = self.dtypes[input_field]
                    if existing != feature.source.dtype:
                        raise ValueError(
                            f"Input field ({input_field}) with 2 dtypes: {existing} vs {feature.source.dtype}"
                        )
                features.append(feature)
                self.input_to_feature_map[input_field] = features
                self.dtypes[input_field] = feature.source.dtype
                self.features_map[feature.name] = feature
                if feature.source.dtype in ("string", "string_lower"):
                    self.dtypes_string_map[input_field] = "str"
        self.input_columns = input_columns

        t = self.transformers
        if not self.defaults.do_not_fix_na_values:
            for column in self.input_columns:
                dt = self.dtypes[column]
                if dt == "bool":
                    t.append(functools.partial(transforms.fix_na_bool, column=column))
                elif dt in ("string", "string_lower"):
                    t.append(functools.partial(transforms.fix_na_str, column=column))
                elif dt == "tensor":
                    emb_dim = max(
                        [f.emb_dim for f in self.input_to_feature_map[column] if isinstance(f, TensorFeature)]
                        or [0]
                    )
                    t.append(functools.partial(transforms.fix_na_tensor, column=column, emb_dim=emb_dim))
                elif dt == "tensor_list":
                    shapes = [
                        f.shape for f in self.input_to_feature_map[column] if isinstance(f, TensorListFeature)
                    ]
                    if shapes:
                        t.append(functools.partial(transforms.fix_na_tensor_list, column=column, shape=shapes[0]))
                        t.append(functools.partial(transforms.fix_partial_tensor_list, column=column, shape=shapes[0]))
                elif dt in ("string_list", "int64_list"):
                    t.append(functools.partial(transforms.fix_na_string_list, column=column))
                elif dt == "int64":
                    t.append(functools.partial(transforms.fix_na_int64, column=column, value_to_lower=True))
                elif dt == "int64_upper":
                    t.append(functools.partial(transforms.fix_na_int64, column=column, value_to_lower=False))
                elif dt == "one_hot_string":
                    t.append(functools.partial(transforms.fix_na_one_hot_string, column=column))
            t.append(transforms.fill_na)

        for input_field, features in self.input_to_feature_map.items():
            for feature in features:
                if input_field != feature.name:
                    if input_field.lower() == feature.name.lower() or len(features) == 1:
                        t.append(
                            functools.partial(
                                transforms.rename_column,
                                src_column=input_field,
                                target_column=feature.name,
                            )
                        )
                    else:
                        t.append(
                            functools.partial(
                                transforms.copy_value,
                                src_column=input_field,
                                target_column=feature.name,
                            )
                        )

        for input_field, features in self.input_to_feature_map.items():
            for feature in features:
                if isinstance(feature, CategoricalFeature):
                    if feature.value_to_number_mapper is not None:
                        if isinstance(feature.value_to_number_mapper, XXHashMapper):
                            t.append(
                                functools.partial(
                                    transforms.xxhash_categorical_values_to_number,
                                    column=feature.name,
                                    value_to_lower=bool(feature.transform_value_to_lowercase),
                                )
                            )
                        elif not isinstance(feature.value_to_number_mapper, NoneMapper):
                            raise ValueError(
                                f"Unsupported mapper for {feature.name}: {feature.value_to_number_mapper}"
                            )
                    elif feature.transform_value_to_lowercase:
                        t.append(functools.partial(transforms.transform_value_to_lower, column=feature.name))
                elif isinstance(feature, LatLongFeature):
                    t.append(functools.partial(transforms.box_lat_long_feature, column=feature.name))
                elif isinstance(feature, OneHotStringFeature):
                    t.append(functools.partial(transforms.create_array_one_hot_feature, column=feature.name))

        # history features last: current-item ids must already be hashed for
        # leak removal (reference feature_config.py:607-620)
        for input_field, features in self.input_to_feature_map.items():
            for feature in features:
                if isinstance(feature, CategoricalHistoryFeature):
                    hash_ids = isinstance(feature.value_to_number_mapper, XXHashMapper)
                    t.append(
                        functools.partial(
                            transforms.handle_categorical_history_feature,
                            column=feature.name,
                            hash_ids=hash_ids,
                            history_length=feature.history_length,
                            history_id_feature_name=feature.history_id_feature_name,
                            remove_history_id_from_history=feature.remove_history_id_from_history,
                        )
                    )

    # -- accessors (reference feature_config.py:622-678) ----------------------

    def get_dtypes(self) -> Dict[str, str]:
        return self.dtypes

    def get_input_columns(self) -> List[str]:
        return self.input_columns

    def get_features_map(self) -> Dict[str, Feature]:
        return self.features_map

    def _get_typed(self, key, kind, cls):
        feature = self.features_map.get(key)
        if feature is not None and feature.kind == kind and isinstance(feature, cls):
            return feature
        return None

    def get_tensor_feature(self, key) -> Optional[TensorFeature]:
        return self._get_typed(key, FeatureKind.Tensor, TensorFeature)

    def get_tensor_list_feature(self, key) -> Optional[TensorListFeature]:
        return self._get_typed(key, FeatureKind.TensorList, TensorListFeature)

    def get_categorical_history_feature(self, key) -> Optional[CategoricalHistoryFeature]:
        return self._get_typed(key, FeatureKind.CategoricalHistory, CategoricalHistoryFeature)

    def get_one_hot_string_feature(self, key) -> Optional[OneHotStringFeature]:
        return self._get_typed(key, FeatureKind.OneHotString, OneHotStringFeature)

    def is_do_not_convert_to_platform_type(self, key) -> bool:
        feature = self.features_map.get(key)
        return feature is not None and feature.do_not_convert_to_platform_type

    def get_transformers(self) -> List[Callable[[pd.DataFrame], None]]:
        return self.transformers

    def default_data_mapper(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.astype(self.dtypes_string_map)
        for transformer in self.transformers:
            transformer(batch)
        return batch
