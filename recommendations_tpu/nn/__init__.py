from recommendations_tpu.nn.functional import (
    quick_gelu,
    gelu_tanh,
    l2_normalize,
    cap_gradients,
)
from recommendations_tpu.nn.embeddings import (
    FlatEmbedding,
    QREmbedding,
    KShiftEmbedding,
    HistogramEmbedding,
    PatternFromTimelocal,
    NAImputationPlusQuantileEmbedding,
    MLP,
    kshift_row_indices,
)
from recommendations_tpu.nn.lsh import (
    SimhashVectorIndexer,
    CosineVectorEmbedding,
    QuantileMapper,
    DenseMapper,
    CosineLinear,
    LearnableCosineVectorEmbedding,
    ProbabilityVectorEmbedding,
)
from recommendations_tpu.nn.logq import (
    LogQState,
    init_logq_state,
    logq_update,
    logq_correction,
)
from recommendations_tpu.nn.attention import (
    MultiHeadAttention,
    MultiQueryAttention,
    RelativePositionBias,
    causal_mask,
)
from recommendations_tpu.nn.transformer import (
    TransformerBlock,
    MoELinear,
    TransformerStack,
)
