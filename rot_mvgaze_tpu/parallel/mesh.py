"""Mesh construction and sharding specs for the data-parallel trainer."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, opt state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Place a host batch dict onto the mesh, batch-sharded (replicated scalars)."""
    if mesh is None:
        return jax.tree.map(jax.device_put, batch)
    bs = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        # put_sharded handles multi-process meshes (local-shard assembly via
        # make_array_from_process_local_data); plain device_put would raise
        # on a sharding that spans non-addressable devices — scalars
        # included (they replicate: local value == global value).
        if x.ndim == 0:
            return put_sharded(x, replicated_sharding(mesh))
        return put_sharded(x, bs)

    return jax.tree.map(put, batch)


def put_sharded(x: Any, sharding: NamedSharding) -> Any:
    """Place one host array onto the mesh under ``sharding``.

    Single-process: plain ``device_put``. Multi-process (multi-host DP): the
    host holds only its shard of the global batch, so the global array is
    assembled with ``jax.make_array_from_process_local_data`` — local shards
    ride ICI/DCN only inside collectives, never through a gather on one host.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)
