from pointcloudprocessing_tpu.parallel.mesh import (
    data_parallel_mesh,
    batch_sharding,
    initialize_multihost,
    replicated_sharding,
    shard_batch,
    shard_train_state,
)

__all__ = [
    "data_parallel_mesh",
    "batch_sharding",
    "initialize_multihost",
    "replicated_sharding",
    "shard_batch",
    "shard_train_state",
]
