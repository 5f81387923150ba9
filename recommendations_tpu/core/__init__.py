from recommendations_tpu.core.mesh import MeshConfig, build_mesh, local_batch_slice
from recommendations_tpu.core.partitioning import (
    PartitionRules,
    named_sharding,
    shard_params,
)
from recommendations_tpu.core.precision import Policy, DEFAULT_POLICY
