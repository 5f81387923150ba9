from recommendations_tpu.parallel.sharded_embedding import (
    sharded_kshift_lookup,
    sharded_embedding_lookup,
    ShardedKShiftEmbedding,
)
