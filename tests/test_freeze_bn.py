"""--freeze_bn: running-stat (fine-tune) BatchNorm during training.

The reference always trains BN in batch-stat mode
(/root/reference/trainer.py:121-143); freeze_bn is a framework-added
fine-tuning option (off by default), so these tests pin its semantics:
stats never move, the forward is exactly the eval-mode forward, and the
affine BN parameters still learn.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from types import SimpleNamespace

from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.train.steps import make_train_step, prepare_rotations
from rot_mvgaze_tpu.train.trainer import TrainState, make_optimizer


def _setup(batch=8):
    model = FeatRotationSymm(backbone_depth=18, num_iter=1)
    metrics = IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5)
    tx = make_optimizer(lambda _t: 1e-3)
    rng = np.random.default_rng(0)
    raw = {
        "img_0": rng.standard_normal((batch, 32, 32, 3)).astype(np.float32),
        "img_1": rng.standard_normal((batch, 32, 32, 3)).astype(np.float32),
        "gt_gaze": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "gt_gaze_1": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "head_pose_0": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
        "head_pose_1": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
    }
    init_data = {
        "img_0": jnp.zeros((2, 32, 32, 3)),
        "img_1": jnp.zeros((2, 32, 32, 3)),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, init_data)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    return model, metrics, tx, raw, state


def _assert_tree_equal(a, b):
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b) > 0
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


class TestFreezeBNStep:
    def test_stats_frozen_params_learn(self):
        model, metrics, tx, raw, state = _setup()
        step = jax.jit(
            make_train_step(model, metrics, tx, image_size=32, augment=False,
                            freeze_bn=True)
        )
        stats0 = jax.tree.map(np.asarray, state.batch_stats)
        params0 = jax.tree.map(np.asarray, state.params)
        for _ in range(3):
            state, out = step(state, raw, jax.random.PRNGKey(1))
        assert np.isfinite(float(out["loss_gaze"]))
        # batch_stats bit-identical after 3 optimizer steps
        _assert_tree_equal(state.batch_stats, stats0)
        # ...while the BN affine parameters (and everything else) learned:
        # at least one scale leaf must have moved
        moved = [
            not np.array_equal(np.asarray(new), old)
            for new, old in zip(
                jax.tree.leaves(state.params), jax.tree.leaves(params0)
            )
        ]
        assert all(moved), "some parameter received no update"

    def test_forward_is_eval_mode_exactly(self):
        model, metrics, tx, raw, state = _setup()
        step = jax.jit(
            make_train_step(model, metrics, tx, image_size=32, augment=False,
                            freeze_bn=True)
        )
        data = {
            "img_0": jnp.asarray(raw["img_0"]),
            "img_1": jnp.asarray(raw["img_1"]),
            **prepare_rotations(raw),
        }
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            data,
            train=False,
        )
        expected = float(metrics(out))
        _, stats = step(state, raw, jax.random.PRNGKey(1))
        assert float(stats["loss_gaze"]) == pytest.approx(expected, rel=1e-5)

    def test_grad_accum_composes(self):
        model, metrics, tx, raw, state = _setup(batch=8)
        step = jax.jit(
            make_train_step(model, metrics, tx, image_size=32, augment=False,
                            freeze_bn=True, grad_accum=2)
        )
        stats0 = jax.tree.map(np.asarray, state.batch_stats)
        state, out = step(state, raw, jax.random.PRNGKey(1))
        assert np.isfinite(float(out["loss_gaze"]))
        _assert_tree_equal(state.batch_stats, stats0)

    def test_default_off_stats_move(self):
        model, metrics, tx, raw, state = _setup()
        step = jax.jit(
            make_train_step(model, metrics, tx, image_size=32, augment=False)
        )
        stats0 = np.concatenate(
            [np.ravel(x) for x in jax.tree.leaves(
                jax.tree.map(np.asarray, state.batch_stats))]
        )
        state, _ = step(state, raw, jax.random.PRNGKey(1))
        stats1 = np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree.leaves(state.batch_stats)]
        )
        assert not np.array_equal(stats0, stats1)


class TestFreezeBNTrainer:
    def _config(self, tmp_path, **overrides):
        cfg = dict(
            mode="train",
            exp_name="synthetic",
            output_dir=str(tmp_path / "logs"),
            ckpt_resume=None,
            print_freq=2,
            seed=0,
            batch_size=6,
            test_batch_size=6,
            epochs=1,
            save_epoch=1,
            image_size=32,
            scheduler_step="epoch",
            freeze_bn=True,
        )
        cfg.update(overrides)
        return SimpleNamespace(**cfg)

    def _loaders(self, tmp_path):
        from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
        from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset

        root = tmp_path / "data"
        root.mkdir()
        write_synthetic_dataset(
            str(root), ["s00.h5"], n_frames=2, image_size=32
        )
        train_ds = GazeDataset("xgaze", str(root), "bgr", ["s00.h5"], seed=0)
        test_ds = GazeDataset("mpiinv", str(root), "rgb", ["s00.h5"], seed=0)
        return (
            BatchLoader(train_ds, batch_size=6, shuffle=True, drop_last=True),
            BatchLoader(test_ds, batch_size=6),
        )

    def test_trainer_epoch_keeps_stats_and_warns_cold(self, tmp_path, capsys):
        from rot_mvgaze_tpu.train import Trainer

        train_loader, test_loader = self._loaders(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        metrics = IterationLoss(
            loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5
        )
        trainer = Trainer(
            self._config(tmp_path), model, metrics, train_loader, test_loader
        )
        assert "--freeze_bn without" in capsys.readouterr().out
        stats0 = jax.tree.map(np.asarray, trainer.state.batch_stats)
        trainer.train_one_epoch(0)
        _assert_tree_equal(trainer.state.batch_stats, stats0)

    def test_no_warning_on_warm_start(self, tmp_path, capsys):
        from rot_mvgaze_tpu.train import Trainer

        train_loader, test_loader = self._loaders(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        metrics = IterationLoss(
            loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5
        )
        init_data = {
            "img_0": jnp.zeros((2, 32, 32, 3)),
            "img_1": jnp.zeros((2, 32, 32, 3)),
            "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
            "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        }
        variables = model.init({"params": jax.random.PRNGKey(0)}, init_data)
        Trainer(
            self._config(tmp_path),
            model,
            metrics,
            train_loader,
            test_loader,
            init_variables=copy.deepcopy(
                jax.tree.map(np.asarray, dict(variables))
            ),
        )
        assert "--freeze_bn without" not in capsys.readouterr().out


class TestFreezeBNInertCombos:
    """freeze_bn applies the model with train=False, so every train-mode-BN
    knob is inert with it — both surfaces (CLI, bench env) must refuse."""

    def test_cli_rejects_train_mode_bn_knobs(self, tmp_path):
        from rot_mvgaze_tpu.cli.main import build_experiment, get_parser

        base = [
            "--mode", "train", "--exp_name", "mpiinv_known",
            "--output_dir", str(tmp_path / "logs"),
            "--freeze_bn", "true",
        ]
        for extra, marker in (
            (["--use_pallas_bn", "true"], "use_pallas_bn"),
            (["--bn_stat_subsample", "4"], "bn_stat_subsample"),
            (["--fuse_views", "true"], "fuse_views"),
        ):
            args = get_parser().parse_args(base + extra)
            with pytest.raises(SystemExit, match=marker):
                build_experiment(args)

    def test_bench_env_rejects_train_mode_bn_knobs(self):
        import os
        import subprocess
        import sys

        proj = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            BENCH_FREEZE_BN="1",
            BENCH_FUSE_VIEWS="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(proj, "bench.py")],
            env=env, capture_output=True, text=True, timeout=300, cwd=proj,
        )
        assert proc.returncode != 0
        assert "BENCH_FUSE_VIEWS" in proc.stderr
        assert '"metric"' not in proc.stdout  # no record emitted
