"""Device mesh + sharding helpers.

The reference has no working distribution (SURVEY §2.11: dead
torch.distributed imports, unused DistributedSampler). Here parallelism
is first-class and TPU-native:

* `data` axis — batch/data parallelism across chips and hosts; XLA
  inserts the gradient psum over ICI.
* `tile` axis — intra-image spatial parallelism: the H dimension of the
  image (and every activation) is sharded, and XLA GSPMD materializes
  conv halo exchanges and the LinearAttention KV-summary reductions as
  ICI collectives automatically. This is exact (linear attention's
  global state is O(d²) — see `models.layers.LinearAttention`).

Both axes compose: a (data, tile) mesh decodes a batch of large images
with each image split across `tile` chips.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    tile: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = data * tile
    if n > len(devices):
        raise ValueError(f"mesh ({data}x{tile}) needs {n} devices, have {len(devices)}")
    mesh_devices = mesh_utils.create_device_mesh((data, tile), devices=devices[:n])
    return Mesh(mesh_devices, axis_names=("data", "tile"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: shard batch over `data`, H over `tile`."""
    return NamedSharding(mesh, P("data", "tile"))


def image_tile_sharding(mesh: Mesh) -> NamedSharding:
    """Single large image: H sharded over every device (data*tile)."""
    return NamedSharding(mesh, P(None, ("data", "tile")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree onto the mesh."""
    return jax.device_put(params, replicated(mesh))
