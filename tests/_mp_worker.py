"""Worker for the true multi-process DP integration test.

Launched twice by tests/test_multiprocess.py with a shared localhost
coordinator: each process owns 4 virtual CPU devices of an 8-device global
mesh, reads its input shard, trains one epoch in lockstep, and evaluates —
exercising jax.distributed init, make_array_from_process_local_data,
replicated state placement, the eval (sum, count) allgather, and per-host
loader sharding, exactly as a 2-host TPU job would.
"""

import os
import sys


def main() -> int:
    port, process_id, data_dir, out_dir = (
        sys.argv[1],
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    # optional 5th arg: views per sample (>2 exercises the V-view stack —
    # MultiViewGazeDataset + multiview train/eval steps — under TRUE
    # multi-process DP, same coordinator/mesh/allgather machinery)
    num_views = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_TEST_CACHE", "/tmp/jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rot_mvgaze_tpu.parallel.distributed import global_mesh, initialize

    initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    from types import SimpleNamespace

    from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
    from rot_mvgaze_tpu.data.multiview import MultiViewGazeDataset
    from rot_mvgaze_tpu.train import Trainer
    from rot_mvgaze_tpu.utils.drivers import Workload

    mesh = global_mesh()
    shard = (process_id, 2)
    keys = ["s00.h5", "s01.h5"]  # two subjects: per-subject table non-trivial
    if num_views > 2:
        train_ds = MultiViewGazeDataset(
            "xgaze", data_dir, "bgr", keys, n_views=num_views, seed=0
        )
        test_ds = MultiViewGazeDataset(
            "mpiinv", data_dir, "rgb", keys, n_views=num_views, seed=0
        )
    else:
        train_ds = GazeDataset("xgaze", data_dir, "bgr", keys, seed=0)
        test_ds = GazeDataset("mpiinv", data_dir, "rgb", keys, seed=0)
    # global batch 8 -> local batch 4, sharded over the global order
    train_loader = BatchLoader(
        train_ds, batch_size=4, shuffle=True, seed=0, drop_last=True,
        num_threads=2, process_shard=shard,
    )
    test_loader = BatchLoader(
        test_ds, batch_size=4, num_threads=2, process_shard=shard
    )
    cfg = SimpleNamespace(
        mode="train", exp_name="mp", output_dir=os.path.join(out_dir, str(process_id)),
        ckpt_resume=None, print_freq=1000, seed=0, batch_size=4,
        test_batch_size=4, epochs=1, save_epoch=10, image_size=32,
        scheduler_step="iteration", num_views=num_views,
    )
    # one owner of the stereo/V-view model+loss wiring (drivers.Workload —
    # same rel_weight/reference_decay/iter_decay defaults this worker used
    # to inline)
    workload = Workload(num_views=num_views, backbone_depth=18, num_iter=1)
    trainer = Trainer(
        cfg,
        workload.model,
        workload.metrics,
        train_loader,
        test_loader,
        mesh=mesh,
    )
    trainer.train_one_epoch(0)
    err = trainer.test(0)
    # Cross-host per-camera aggregation: every process must emit the SAME
    # global table (sum/count allgather over idx_0 % 18 groups).
    detail = trainer.test_breakdown()
    assert detail["per_camera"], detail
    cams = ",".join(
        f"{c}:{s['error']:.8f}:{s['n']}"
        for c, s in sorted(detail["per_camera"].items())
    )
    print(f"MPBREAKDOWN {process_id} n={detail['n']} {cams}", flush=True)
    # Per-subject must ALSO be the identical global table on both hosts:
    # each host replays its deterministic eval row order and the (sum,
    # count) groups are allgathered over the shared subject vocabulary.
    assert detail["per_subject"], detail
    subj = ",".join(
        f"{k}:{s['error']:.8f}:{s['n']}"
        for k, s in sorted(detail["per_subject"].items())
    )
    print(f"MPSUBJECTS {process_id} n={detail['n']} {subj}", flush=True)
    print(f"MPFINAL {process_id} {err:.10f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
