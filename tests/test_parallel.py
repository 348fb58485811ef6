"""Data-parallel tests on the 8-virtual-device CPU mesh."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rot_mvgaze_tpu.parallel import batch_sharding, make_mesh, shard_batch


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_shard_batch(self):
        mesh = make_mesh()
        batch = {"img_0": np.zeros((16, 8, 8, 3), np.uint8), "n": np.int32(3)}
        out = shard_batch(batch, mesh)
        assert out["img_0"].sharding.spec == batch_sharding(mesh).spec
        # scalar replicated
        assert out["n"].sharding.is_fully_replicated


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        # The full driver invocation (default args, subprocess, wall-clock
        # budget) is covered by tests/test_driver_artifacts.py; here run the
        # in-process API once at the cheapest config to cover the Python
        # surface (assertions, sharding setup, eval padding).
        import __graft_entry__ as graft

        graft.dryrun_multichip(8, n_steps=4, config="reduced")

    def test_dryrun_config_validation(self):
        import __graft_entry__ as graft

        with pytest.raises(ValueError, match="unknown dryrun config"):
            graft.dryrun_multichip(8, config="nope")
        with pytest.raises(ValueError, match="n_steps"):
            graft.dryrun_multichip(8, n_steps=3)
        # legacy bool maps onto the named configs; tuple fields are
        # (image_size, depth, dtype, spatial, num_views) since r5
        assert graft._DRYRUN_CONFIGS["flagship"] == (224, 50, "bfloat16",
                                                     1, 2)
        assert graft._DRYRUN_CONFIGS["reduced"] == (64, 18, "float32", 1, 2)
        assert graft._DRYRUN_CONFIGS["multiview"] == (64, 18, "float32",
                                                      1, 3)

    def test_entry_compiles(self):
        import __graft_entry__ as graft

        fn, (variables, data) = graft.entry()
        out = jax.jit(fn)(variables, data)
        assert out.shape == (8, 2)


class TestDataParallelEquivalence:
    def test_sharded_step_matches_single_device(self):
        """One DP train step over the mesh == the same step on one device."""
        from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
        from rot_mvgaze_tpu.models import FeatRotationSymm
        from rot_mvgaze_tpu.parallel.mesh import replicated_sharding
        from rot_mvgaze_tpu.train.schedule import cyclic_triangular2
        from rot_mvgaze_tpu.train.steps import make_train_step
        from rot_mvgaze_tpu.train.trainer import TrainState, make_optimizer

        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        metrics = IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5)
        tx = make_optimizer(cyclic_triangular2(1e-4, 1e-4, 5, 5))

        rng = np.random.default_rng(0)
        batch = {
            "img_0": rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8),
            "img_1": rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8),
            "gt_gaze": rng.uniform(-1, 1, (8, 2)).astype(np.float32),
            "gt_gaze_1": rng.uniform(-1, 1, (8, 2)).astype(np.float32),
            "head_pose_0": rng.uniform(-0.8, 0.8, (8, 2)).astype(np.float32),
            "head_pose_1": rng.uniform(-0.8, 0.8, (8, 2)).astype(np.float32),
        }
        init_data = {
            "img_0": jnp.zeros((2, 32, 32, 3)),
            "img_1": jnp.zeros((2, 32, 32, 3)),
            "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
            "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        }
        variables = model.init({"params": jax.random.PRNGKey(0)}, init_data)

        def fresh_state():
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=tx.init(variables["params"]),
            )

        step = make_train_step(model, metrics, tx, image_size=32)
        key = jax.random.PRNGKey(7)

        # single device
        s1, stats1 = jax.jit(step)(fresh_state(), batch, key)

        # 8-device mesh
        mesh = make_mesh()
        rep = replicated_sharding(mesh)
        state8 = jax.device_put(fresh_state(), rep)
        batch8 = shard_batch(batch, mesh)
        s8, stats8 = jax.jit(step, out_shardings=(rep, rep))(state8, batch8, key)

        np.testing.assert_allclose(
            float(stats1["loss_gaze"]), float(stats8["loss_gaze"]), rtol=1e-5
        )
        a = np.asarray(s1.params["gaze_estimator_0"]["dense_1"]["kernel"])
        b = np.asarray(s8.params["gaze_estimator_0"]["dense_1"]["kernel"])
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestTrainerWithMesh:
    def test_trainer_trains_on_mesh(self, tmp_path):
        """Full Trainer loop over the 8-device mesh on synthetic data."""
        from types import SimpleNamespace

        from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
        from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset
        from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
        from rot_mvgaze_tpu.models import FeatRotationSymm
        from rot_mvgaze_tpu.train import Trainer

        root = tmp_path / "data"
        root.mkdir()
        write_synthetic_dataset(str(root), ["s00.h5"], n_frames=2, image_size=32)
        train_ds = GazeDataset("xgaze", str(root), "bgr", ["s00.h5"], seed=0)
        test_ds = GazeDataset("mpiinv", str(root), "rgb", ["s00.h5"], seed=0)
        cfg = SimpleNamespace(
            mode="train", exp_name="mesh", output_dir=str(tmp_path / "logs"),
            ckpt_resume=None, print_freq=100, seed=0, batch_size=8,
            test_batch_size=8, epochs=1, save_epoch=10, image_size=32,
            scheduler_step="iteration",
        )
        mesh = make_mesh()
        trainer = Trainer(
            cfg,
            FeatRotationSymm(backbone_depth=18, num_iter=1),
            IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5),
            BatchLoader(train_ds, batch_size=8, shuffle=True, drop_last=True),
            BatchLoader(test_ds, batch_size=10),  # ragged final batch: pad path
            mesh=mesh,
        )
        trainer.train_one_epoch(0)
        err = trainer.test(0)
        assert np.isfinite(err)
        # params remained replicated across the mesh
        p = trainer.state.params["backbone"]["conv1"]["kernel"]
        assert p.sharding.is_fully_replicated


def test_explicit_cluster_init_failure_raises():
    """initialize(num_processes=..., process_id=...) is an EXPLICIT cluster
    request even without coordinator_address: a failed init must raise, not
    silently degrade to independent single-host runs (which would train
    garbage at scale). Run in a subprocess so a partial jax.distributed
    init cannot wedge this process."""
    import subprocess
    import sys

    code = (
        "from rot_mvgaze_tpu.parallel.distributed import initialize\n"
        "try:\n"
        "    initialize(num_processes=2, process_id=0)\n"
        "except RuntimeError as e:\n"
        "    assert 'configured or auto-detected cluster' in str(e), e\n"
        "    print('RAISED-OK')\n"
        "else:\n"
        "    print('SILENT-DEGRADE')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
        env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
    )
    assert "RAISED-OK" in out.stdout, (out.stdout, out.stderr[-2000:])
