from .mesh import (
    batch_sharding,
    image_tile_sharding,
    make_mesh,
    replicated,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "image_tile_sharding",
    "make_mesh",
    "replicated",
    "shard_params",
]
