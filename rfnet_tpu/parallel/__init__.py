from rfnet_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "maybe_initialize_distributed",
    "replicated",
    "shard_batch",
]
