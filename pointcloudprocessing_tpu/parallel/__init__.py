from pointcloudprocessing_tpu.parallel.mesh import (
    data_parallel_mesh,
    batch_sharding,
    replicated_sharding,
    shard_train_state,
)

__all__ = [
    "data_parallel_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_train_state",
]
