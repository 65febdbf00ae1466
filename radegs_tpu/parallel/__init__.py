from radegs_tpu.parallel.sharding import (
    gaussian_sharding,
    make_mesh,
    replicate,
    shard_camera,
    shard_train_state,
)

__all__ = [
    "make_mesh",
    "gaussian_sharding",
    "shard_train_state",
    "shard_camera",
    "replicate",
]
