from .mesh import (
    make_mesh,
    shard_train_state,
    replicate,
    batch_sharding,
    shard_bank,
)

__all__ = [
    "make_mesh",
    "shard_train_state",
    "replicate",
    "batch_sharding",
    "shard_bank",
]
