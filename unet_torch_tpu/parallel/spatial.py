"""Spatial (height-axis) partitioning — the context-parallel analogue.

The reference handles large pathology slides by tiling (SURVEY §5: random-crop
train + pad-and-tile eval); attention sequences are tiny, so classical
sequence parallelism never applies.  What *does* scale on TPU is SPMD spatial
partitioning of the conv activations themselves: shard the image H axis over
the ``model`` mesh axis and XLA inserts the halo exchanges for every 3x3 conv
automatically.  That lets one >2K² image span multiple chips with no tiling
seams and no code changes to the model.

Helpers here annotate inputs/outputs with (data, model)-sharded layouts; the
model code stays unchanged — this is pure sharding metadata.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) arrays: batch over 'data', height over 'model'."""
    return NamedSharding(mesh, P("data", "model"))


def shard_spatial(mesh: Mesh, batch):
    """Device-put image-like leaves with batch+height sharding; other leaves
    replicate."""
    sharded = spatial_sharding(mesh)
    replicated = NamedSharding(mesh, P())

    def put(x):
        ok = (hasattr(x, "shape") and x.ndim >= 3
              and x.shape[0] % mesh.shape["data"] == 0
              and x.shape[1] % mesh.shape["model"] == 0)
        return jax.device_put(x, sharded if ok else replicated)

    return jax.tree_util.tree_map(put, batch)
