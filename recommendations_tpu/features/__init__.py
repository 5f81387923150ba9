from recommendations_tpu.features.constants import (
    MAX_LONG_VALUE_PLUS_ONE,
    CATEGORICAL_VAR_HASH_PAD_TOKEN,
    NA_NUMERICAL_VALUE,
)
from recommendations_tpu.features.hashing import (
    hash_feature_name_to_int,
    hash_string_to_long,
    hash_strings_to_long,
)
from recommendations_tpu.features.feature_config import (
    FeaturesConfig,
    Feature,
    FeatureKind,
    FeatureDefaults,
    BoolFeature,
    NumericalFeature,
    CategoricalFeature,
    CategoricalHistoryFeature,
    TensorFeature,
    TensorListFeature,
    TimestampFeature,
    LatLongFeature,
    OneHotStringFeature,
    Task,
    GroupDatasetConfig,
    EmbeddingTable,
)
