"""Device-mesh / sharding utilities for data-parallel training.

The reference is single-process single-GPU (/root/reference/main.py:212);
here scale-out is first-class: a 1-D ``Mesh(('data',))`` with batch-sharded
inputs and replicated params. Gradient all-reduce and cross-replica BatchNorm
statistics fall out of GSPMD (XLA inserts the ICI collectives from the
sharding annotations) — no hand-written communication.
"""

from rot_mvgaze_tpu.parallel.mesh import (
    batch_sharding,
    data_axis,
    dp_size,
    image_sharding,
    leaf_sharding,
    make_mesh,
    pin_images,
    replicated_sharding,
    shard_batch,
    spatial_size,
    unshard_spec,
    with_spatial_floor,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "data_axis",
    "image_sharding",
    "leaf_sharding",
    "pin_images",
    "replicated_sharding",
    "shard_batch",
    "dp_size",
    "spatial_size",
    "unshard_spec",
    "with_spatial_floor",
]
