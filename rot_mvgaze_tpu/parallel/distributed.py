"""Multi-host (multi-process) data-parallel setup.

The reference is strictly single-process (/root/reference/main.py:212). At
scale, each host drives its local TPU chips and reads its own shard of the
dataset; gradients all-reduce over ICI within a slice and DCN across slices —
all expressed through the same GSPMD shardings as single-host DP
(rot_mvgaze_tpu.parallel.mesh), just over a global mesh.

Usage on every host::

    from rot_mvgaze_tpu.parallel.distributed import initialize, global_mesh
    initialize()                     # jax.distributed (env-driven)
    mesh = global_mesh()             # 1-D 'data' mesh over ALL chips
    shard = host_shard(len(dataset)) # this host's sample range

then feed per-host batches with
``jax.make_array_from_process_local_data(batch_sharding(mesh), local_batch)``.
"""

from __future__ import annotations

import os as _os
from typing import Optional, Tuple

import jax

from rot_mvgaze_tpu.parallel.mesh import DATA_AXIS, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process).

    With no args, cluster parameters come from the environment (TPU pods
    auto-discover; elsewhere set JAX_COORDINATOR_ADDRESS etc.). Must run
    BEFORE the first device use — so no ``jax.process_count()`` pre-check
    here, which would itself initialize the local-only backend.
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        # Benign re-init: a launcher wrapper (or an earlier
        # build_experiment in this process) already initialized the
        # cluster. jax 0.9 raises 'distributed.initialize should only be
        # called once.' here — a healthy job, not an error.
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # Distinguish "no cluster configured / already initialized" (benign:
        # proceed single-process) from a REAL multi-host init failure
        # (unreachable coordinator, bad process_id): silently degrading a
        # pod job to N independent single-host runs would train garbage with
        # no error. "Cluster requested" covers explicit args, the explicit
        # env contract, AND the auto-detection signals jax's cluster plugins
        # key on (Slurm, Open MPI/PMI, multi-worker Cloud TPU pods,
        # Megascale) — an unreachable coordinator on an auto-detected pod
        # must fail loudly too.
        cluster_requested = (
            coordinator_address is not None
            or num_processes is not None
            or process_id is not None
        ) or any(
            _os.environ.get(k)
            for k in (
                "JAX_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID",
                "SLURM_JOB_ID",
                "SLURM_NTASKS",
                "OMPI_COMM_WORLD_SIZE",
                "PMI_SIZE",
                "MEGASCALE_COORDINATOR_ADDRESS",
            )
        )
        # Multi-worker Cloud TPU pod: the TPU runtime publishes every
        # worker's hostname; >1 entry means this host is part of a pod.
        workers = _os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([w for w in workers.split(",") if w.strip()]) > 1:
            cluster_requested = True
        msg = str(e).lower()
        benign = (
            "already initialized" in msg
            or "should only be called once" in msg
            or not cluster_requested
        )
        if not benign:
            raise RuntimeError(
                f"jax.distributed.initialize failed for a configured or "
                f"auto-detected cluster (coordinator="
                f"{coordinator_address or 'env'}): {e}"
            ) from e


def global_mesh(spatial: int = 1) -> "jax.sharding.Mesh":
    """Data mesh over every chip in the job (all hosts).

    ``spatial > 1`` returns the 2-D ``(data, spatial)`` mesh: groups of
    ``spatial`` consecutive chips co-operate on each image's height axis
    (conv halo exchange over ICI) while data parallelism runs over the
    groups — see ``parallel.mesh.make_mesh``. Spatial groups may not span
    hosts (``make_mesh`` enforces it)."""
    return make_mesh(jax.devices(), axis_name=DATA_AXIS, spatial=spatial)


def host_shard(n: int) -> Tuple[int, int]:
    """[start, stop) range of dataset indices this host is responsible for.

    Splits as evenly as possible; earlier hosts take the remainder.
    """
    p = jax.process_count()
    i = jax.process_index()
    base, rem = divmod(n, p)
    start = i * base + min(i, rem)
    stop = start + base + (1 if i < rem else 0)
    return start, stop


def local_batch_to_global(batch, mesh):
    """Assemble a globally-sharded batch from this host's local shard.

    Delegates to ``mesh.shard_batch`` — one implementation of the
    single-vs-multi-process placement rule (and of scalar replication), not
    two that can drift."""
    from rot_mvgaze_tpu.parallel.mesh import shard_batch

    return shard_batch(batch, mesh)
