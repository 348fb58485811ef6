"""Mesh construction and sharding specs for the trainer.

Two mesh shapes, both pure GSPMD (shardings in, XLA inserts collectives):

- 1-D ``('data',)`` — plain data parallelism: batch sharded, params
  replicated, gradient/BN-stat all-reduce over the mesh.
- 2-D ``('data', 'spatial')`` — data parallelism crossed with SPATIAL
  partitioning: the image height axis of every NHWC tensor is additionally
  sharded over 'spatial', so each conv runs on an H-slice and XLA inserts
  halo exchanges (``collective-permute`` of the kernel-overlap rows)
  between neighbours. This is the classic TPU technique for the regimes
  batch-DP cannot reach — per-chip batch < 1 (latency-critical serving of
  a single request over several chips) or activations of one sample
  exceeding HBM (high-resolution inputs). Verified on the compiled HLO:
  the R18 forward under ``P('data', 'spatial')`` contains 105
  collective-permute halo ops and only 6 all-gathers (at the
  global-average-pool boundary where the spatial extent collapses).
  The reference has no equivalent (single GPU, /root/reference/main.py:212).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
    spatial: int = 1,
) -> Mesh:
    """Data-parallel mesh over all (or the given) devices.

    ``spatial > 1`` folds the devices into a 2-D ``(data, spatial)`` mesh:
    every group of ``spatial`` consecutive devices co-operates on the
    height axis of each image (halo-exchange partners), and data
    parallelism runs over the ``n/spatial`` groups. Consecutive devices
    are the right halo partners: ``jax.devices()`` orders by process and
    locality, so halos ride ICI within a host, never DCN.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if spatial <= 1:
        return Mesh(np.array(devices), (axis_name,))
    if len(devices) % spatial:
        raise ValueError(
            f"spatial={spatial} must divide the device count {len(devices)}"
        )
    grid = np.array(devices).reshape(len(devices) // spatial, spatial)
    if jax.process_count() > 1:
        # Halo exchanges are latency-sensitive and the host input path
        # assembles per-process local shards; a spatial group spanning
        # processes would put halos on DCN AND break
        # make_array_from_process_local_data's addressable-shard contract.
        for row in grid:
            procs = {d.process_index for d in row}
            if len(procs) > 1:
                raise ValueError(
                    f"a spatial group spans processes {sorted(procs)}; "
                    f"spatial={spatial} must divide the per-process device "
                    f"count ({len(devices) // jax.process_count()})"
                )
    return Mesh(grid, (axis_name, SPATIAL_AXIS))


def data_axis(mesh: Mesh) -> str:
    """The mesh's batch axis NAME. ``make_mesh`` accepts a custom
    ``axis_name``, so sharding rules must read the mesh's actual first
    axis instead of assuming the literal ``'data'`` — a custom-named 1-D
    mesh would otherwise silently compute ``dp_size() == 1`` (no batch
    rounding, under-sharded puts)."""
    return mesh.axis_names[0]


def dp_size(mesh: Optional[Mesh]) -> int:
    """Number of ways the BATCH axis is sharded (1 without a mesh)."""
    if mesh is None:
        return 1
    return int(mesh.shape[data_axis(mesh)])


def spatial_size(mesh: Optional[Mesh]) -> int:
    """Number of ways the image HEIGHT axis is sharded (1 without one)."""
    if mesh is None or SPATIAL_AXIS not in mesh.axis_names:
        return 1
    return int(mesh.shape[SPATIAL_AXIS])


def batch_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Shard leading (batch) dim across the mesh's data axis."""
    return NamedSharding(mesh, P(axis_name or data_axis(mesh)))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC image leaves: batch over the data axis, and — on a
    2-D mesh — height over 'spatial' (conv halo exchange inserted by GSPMD)."""
    if spatial_size(mesh) > 1:
        return NamedSharding(mesh, P(data_axis(mesh), SPATIAL_AXIS))
    return batch_sharding(mesh)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, opt state)."""
    return NamedSharding(mesh, P())


def unshard_spec(mesh: Mesh) -> NamedSharding:
    """Batch-only sharding for activations whose height axis must be
    GATHERED off the 'spatial' axis (the backbone's spatial floor — see
    models/resnet.py ResNet.spatial_unshard)."""
    return NamedSharding(mesh, P(data_axis(mesh)))


def with_spatial_floor(model: Any, mesh: Optional[Mesh]) -> Any:
    """Clone ``model`` with the backbone's spatial floor on a 2-D mesh
    (``ResNet.spatial_unshard``): gather the height axis once feature maps
    get too small to shard. MANDATORY for correctness, not just perf — XLA's
    SPMD partitioner mis-compiles the backward at <2-valid-row spatial
    shards (models/resnet.py min_spatial_shard_rows), so a model that cannot
    take the floor must be REJECTED rather than silently trained sharded.
    The single entry point used by the Trainer, GazePredictor, and the
    driver dryrun. No-op on 1-D/absent meshes."""
    sp = spatial_size(mesh)
    if sp <= 1:
        return model
    if not hasattr(model, "spatial_unshard"):
        raise ValueError(
            f"{type(model).__name__} has no spatial_unshard field; training "
            f"or serving it under a spatial mesh risks silently wrong "
            f"gradients at tiny spatial extents (XLA SPMD backward "
            f"mis-compile — see models/resnet.py). Use a 1-D data mesh."
        )
    return model.clone(spatial_unshard=(sp, unshard_spec(mesh)))


def pin_images(data: Any, sharding: Optional[NamedSharding]) -> Any:
    """Re-pin the two image views of a data dict to ``sharding`` via
    ``with_sharding_constraint`` (no-op when ``sharding`` is None).

    Used inside every jitted step on a 2-D mesh: without the constraint
    GSPMD is free to resolve the augmentation/resize stage's gathers by
    replicating the spatial axis — and once replicated it stays replicated,
    silently degrading spatial partitioning to duplicated per-device
    compute (observed on compiled HLO: zero halo collectives). One helper
    so the train, eval, serving, and calibration steps cannot drift."""
    if sharding is None:
        return data
    return {
        **data,
        **{
            k: jax.lax.with_sharding_constraint(data[k], sharding)
            for k in ("img_0", "img_1")
            if k in data
        },
    }


def leaf_sharding(mesh: Mesh, x: Any) -> NamedSharding:
    """The placement rule for one host batch leaf: scalars replicate,
    rank-4 NHWC images shard (batch, height*), everything else shards on
    batch only. The single source of truth shared by ``shard_batch`` and
    the prefetch/eval paths."""
    ndim = np.ndim(x)  # no host copy: reads .ndim when present
    if ndim == 0:
        return replicated_sharding(mesh)
    if ndim == 4:
        return image_sharding(mesh)
    return batch_sharding(mesh)


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Place a host batch dict onto the mesh (see ``leaf_sharding``)."""
    if mesh is None:
        return jax.tree.map(jax.device_put, batch)

    def put(x):
        x = np.asarray(x)
        # put_sharded handles multi-process meshes (local-shard assembly via
        # make_array_from_process_local_data); plain device_put would raise
        # on a sharding that spans non-addressable devices — scalars
        # included (they replicate: local value == global value).
        return put_sharded(x, leaf_sharding(mesh, x))

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
