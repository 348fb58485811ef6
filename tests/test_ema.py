"""--ema_decay: exponential moving average of the weights.

Framework-added (the reference trains/evals raw weights only,
/root/reference/trainer.py:117-199). Pins the contract: the EMA update is
``d*ema + (1-d)*params`` AFTER each optimizer update, seeded at the
starting weights; eval-side surfaces (Trainer.test, --export_torch,
weight-only checkpoint loads) use the EMA tree when present; checkpoints
carry both trees; legacy checkpoints and decay=0 stay byte-compatible.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.train.steps import make_train_step, update_ema
from rot_mvgaze_tpu.train.trainer import TrainState, make_optimizer

DECAY = 0.5  # large (1-d) so drift is visible within a few steps


def _setup(batch=8, ema=True):
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
        ema_params=variables["params"] if ema else None,
    )
    return model, metrics, tx, raw, state


def _allclose_tree(a, b, **kw):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb) > 0
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


class TestStepEMA:
    def test_matches_manual_recompute(self):
        model, metrics, tx, raw, state = _setup()
        step = jax.jit(
            make_train_step(model, metrics, tx, image_size=32, augment=False,
                            ema_decay=DECAY)
        )
        manual = jax.tree.map(np.asarray, state.params)
        for i in range(3):
            state, _ = step(state, raw, jax.random.PRNGKey(i))
            manual = jax.tree.map(
                lambda e, p: DECAY * e + (1 - DECAY) * np.asarray(p),
                manual,
                state.params,
            )
        # the EMA trails the raw weights...
        assert any(
            not np.allclose(np.asarray(e), np.asarray(p))
            for e, p in zip(
                jax.tree.leaves(state.ema_params),
                jax.tree.leaves(state.params),
            )
        )
        # ...and equals the closed-form fold of the params trajectory
        _allclose_tree(state.ema_params, manual, rtol=1e-6, atol=1e-7)

    def test_decay_zero_passthrough(self):
        model, metrics, tx, raw, state = _setup(ema=False)
        step = jax.jit(
            make_train_step(model, metrics, tx, image_size=32, augment=False)
        )
        for i in range(2):
            state, _ = step(state, raw, jax.random.PRNGKey(i))
        assert state.ema_params is None

    def test_decay_without_seeded_tree_raises(self):
        model, metrics, tx, raw, state = _setup(ema=False)
        step = make_train_step(
            model, metrics, tx, image_size=32, augment=False, ema_decay=DECAY
        )
        with pytest.raises(ValueError, match="ema_params"):
            step(state, raw, jax.random.PRNGKey(0))

    def test_params_trajectory_unaffected(self):
        # the EMA never feeds back into the update
        model, metrics, tx, raw, s_ema = _setup()
        *_, s_off = _setup(ema=False)
        step_ema = jax.jit(
            make_train_step(model, metrics, tx, image_size=32, augment=False,
                            ema_decay=DECAY)
        )
        step_off = jax.jit(
            make_train_step(model, metrics, tx, image_size=32, augment=False)
        )
        for i in range(2):
            s_ema, _ = step_ema(s_ema, raw, jax.random.PRNGKey(i))
            s_off, _ = step_off(s_off, raw, jax.random.PRNGKey(i))
        for a, b in zip(
            jax.tree.leaves(s_ema.params), jax.tree.leaves(s_off.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_multiview_step_ema(self):
        from rot_mvgaze_tpu.losses.multiview import MultiViewL1Loss
        from rot_mvgaze_tpu.models.multiview import FeatRotationMultiView
        from rot_mvgaze_tpu.train.multiview_steps import (
            make_multiview_train_step,
        )

        V = 3
        model = FeatRotationMultiView(backbone_depth=18, num_iter=1)
        metrics = IterationLoss(
            loss=MultiViewL1Loss(rel_weight=0.01), iter_decay=0.5
        )
        tx = make_optimizer(lambda _t: 1e-3)
        rng = np.random.default_rng(0)
        raw = {
            "imgs": rng.standard_normal((4, V, 32, 32, 3)).astype(np.float32),
            "gt_gazes": rng.uniform(-1, 1, (4, V, 2)).astype(np.float32),
            "head_poses": rng.uniform(-0.8, 0.8, (4, V, 2)).astype(
                np.float32
            ),
        }
        init = {
            "imgs": jnp.zeros((2, V, 32, 32, 3)),
            "rots": jnp.broadcast_to(jnp.eye(3), (2, V, 3, 3)),
        }
        variables = model.init({"params": jax.random.PRNGKey(0)}, init)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            ema_params=variables["params"],
        )
        step = jax.jit(
            make_multiview_train_step(
                model, metrics, tx, image_size=32, augment=False,
                ema_decay=DECAY,
            )
        )
        manual = jax.tree.map(np.asarray, state.params)
        for i in range(2):
            state, _ = step(state, raw, jax.random.PRNGKey(i))
            manual = jax.tree.map(
                lambda e, p: DECAY * e + (1 - DECAY) * np.asarray(p),
                manual,
                state.params,
            )
        _allclose_tree(state.ema_params, manual, rtol=1e-6, atol=1e-7)


class TestUpdateEmaHelper:
    def test_identity_when_disabled(self):
        tree = {"w": jnp.ones(3)}
        assert update_ema(None, tree, 0.0) is None
        assert update_ema(tree, {"w": jnp.zeros(3)}, 0.0) is tree


class TestVariablesFromTree:
    def test_prefers_ema_params(self, capsys):
        from rot_mvgaze_tpu.train.checkpoints import variables_from_tree

        tree = {
            "params": {"w": np.ones(2)},
            "batch_stats": {"m": np.zeros(2)},
            "ema_params": {"w": np.full(2, 3.0)},
        }
        v = variables_from_tree(tree, {})
        np.testing.assert_array_equal(v["params"]["w"], np.full(2, 3.0))
        assert "EMA weights" in capsys.readouterr().out
        # absent / None: raw params, no note
        for t in (
            {"params": {"w": np.ones(2)}},
            {"params": {"w": np.ones(2)}, "ema_params": None},
        ):
            v = variables_from_tree(t, {})
            np.testing.assert_array_equal(v["params"]["w"], np.ones(2))
            assert "EMA" not in capsys.readouterr().out

    def test_prefer_ema_false_keeps_raw_silently(self, capsys):
        # the Trainer's full-state resume path: the result is only an
        # optimizer-init template, so no swap and no note
        from rot_mvgaze_tpu.train.checkpoints import variables_from_tree

        tree = {
            "params": {"w": np.ones(2)},
            "ema_params": {"w": np.full(2, 3.0)},
            "opt_state": {},
        }
        v = variables_from_tree(tree, {}, prefer_ema=False)
        np.testing.assert_array_equal(v["params"]["w"], np.ones(2))
        assert "EMA" not in capsys.readouterr().out


class TestTrainerEMA:
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
            ema_decay=DECAY,
        )
        cfg.update(overrides)
        return SimpleNamespace(**cfg)

    def _loaders(self, tmp_path):
        from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
        from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset

        root = tmp_path / "data"
        if not root.exists():
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

    def _trainer(self, tmp_path, cfg):
        from rot_mvgaze_tpu.train import Trainer

        train_loader, test_loader = self._loaders(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        metrics = IterationLoss(
            loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5
        )
        return Trainer(cfg, model, metrics, train_loader, test_loader)

    def test_epoch_then_checkpoint_roundtrip(self, tmp_path):
        trainer = self._trainer(tmp_path, self._config(tmp_path))
        assert trainer.state.ema_params is not None
        trainer.train_one_epoch(0)
        # EMA trails the raw weights after a trained epoch
        assert any(
            not np.allclose(np.asarray(e), np.asarray(p))
            for e, p in zip(
                jax.tree.leaves(trainer.state.ema_params),
                jax.tree.leaves(trainer.state.params),
            )
        )
        # eval-side surfaces score the EMA tree
        assert trainer.eval_params is trainer.state.ema_params
        err = trainer.test(0)
        assert np.isfinite(err)
        path = trainer.save_checkpoint(add="ema_test")
        ema_before = jax.tree.map(np.asarray, trainer.state.ema_params)

        # full-state resume restores BOTH trees exactly
        resumed = self._trainer(
            tmp_path, self._config(tmp_path, ckpt_resume=path)
        )
        _allclose_tree(resumed.state.ema_params, ema_before, rtol=0, atol=0)
        _allclose_tree(resumed.state.params, trainer.state.params,
                       rtol=0, atol=0)

    def test_legacy_checkpoint_seeds_ema(self, tmp_path, capsys):
        # a checkpoint saved WITHOUT ema: resume with --ema_decay warm-starts
        # the average from its params
        t0 = self._trainer(tmp_path, self._config(tmp_path, ema_decay=0.0))
        t0.train_one_epoch(0)
        path = t0.save_checkpoint(add="no_ema")
        from rot_mvgaze_tpu.train.checkpoints import restore_tree

        assert restore_tree(path).get("ema_params") is None

        capsys.readouterr()
        t1 = self._trainer(
            tmp_path, self._config(tmp_path, ckpt_resume=path)
        )
        assert "seeding the EMA" in capsys.readouterr().out
        _allclose_tree(t1.state.ema_params, t1.state.params, rtol=0, atol=0)

    def test_train_resume_without_flag_drops_ema_loudly(
        self, tmp_path, capsys
    ):
        t0 = self._trainer(tmp_path, self._config(tmp_path))
        t0.train_one_epoch(0)
        path = t0.save_checkpoint(add="with_ema")
        capsys.readouterr()
        t1 = self._trainer(
            tmp_path, self._config(tmp_path, ema_decay=0.0, ckpt_resume=path)
        )
        assert "dropping them" in capsys.readouterr().out
        assert t1.state.ema_params is None
        assert t1.eval_params is t1.state.params

    def test_test_mode_keeps_ema(self, tmp_path):
        t0 = self._trainer(tmp_path, self._config(tmp_path))
        t0.train_one_epoch(0)
        path = t0.save_checkpoint(add="with_ema")
        ema = jax.tree.map(np.asarray, t0.state.ema_params)
        # --mode test without --ema_decay still scores the EMA weights
        t1 = self._trainer(
            tmp_path,
            self._config(tmp_path, mode="test", ema_decay=0.0,
                         ckpt_resume=path),
        )
        assert t1.state.ema_params is not None
        _allclose_tree(t1.eval_params, ema, rtol=0, atol=0)

    def test_export_torch_exports_ema(self, tmp_path):
        import torch

        trainer = self._trainer(tmp_path, self._config(tmp_path))
        trainer.train_one_epoch(0)
        out = str(tmp_path / "ema_export.pth.tar")
        trainer.export_torch_checkpoint(out)
        sd = torch.load(out, map_location="cpu", weights_only=True)
        # one spot-checked conv: the exported tensor is the EMA leaf, not
        # the raw param (kernel OIHW <-> HWIO transpose)
        ema_leaf = np.asarray(
            trainer.state.ema_params["backbone"]["conv1"]["kernel"]
        )
        raw_leaf = np.asarray(
            trainer.state.params["backbone"]["conv1"]["kernel"]
        )
        got = sd["_feat_extractor.0.conv1.weight"].numpy().transpose(
            2, 3, 1, 0
        )
        np.testing.assert_allclose(got, ema_leaf, rtol=0, atol=0)
        assert not np.allclose(got, raw_leaf)

    def test_no_ema_checkpoint_has_pre_ema_layout(self, tmp_path):
        # decay=0 runs serialize NO ema_params key at all: a stored None
        # would fail from_state_dict ("unknown field") in pre-EMA builds of
        # this framework — the layout must stay byte-compatible.
        t0 = self._trainer(tmp_path, self._config(tmp_path, ema_decay=0.0))
        t0.train_one_epoch(0)
        path = t0.save_checkpoint(add="layout")
        from rot_mvgaze_tpu.train.checkpoints import restore_tree

        assert "ema_params" not in restore_tree(path)

    def test_renamed_full_checkpoint_still_full_restores(self, tmp_path):
        # The full-state resume keys off tree CONTENTS, not the .msgpack
        # extension: a renamed full TrainState checkpoint must restore
        # opt_state/step AND score the EMA weights in --mode test (not
        # silently fall back to a weight-only load of the raw params).
        import shutil

        t0 = self._trainer(tmp_path, self._config(tmp_path))
        t0.train_one_epoch(0)
        path = t0.save_checkpoint(add="to_rename")
        renamed = str(tmp_path / "renamed.ckpt")
        shutil.copy(path, renamed)
        ema = jax.tree.map(np.asarray, t0.state.ema_params)

        t1 = self._trainer(
            tmp_path,
            self._config(tmp_path, mode="test", ema_decay=0.0,
                         ckpt_resume=renamed),
        )
        assert int(t1.state.step) == int(t0.state.step) > 0
        assert t1.state.ema_params is not None
        _allclose_tree(t1.eval_params, ema, rtol=0, atol=0)

    def test_weights_only_warm_start(self, tmp_path):
        # --weights_only: a FULL TrainState checkpoint becomes a bare
        # weight source — fresh optimizer, step 0, full epoch budget, and
        # the EMA tree (the deployment weights) as the starting params
        t0 = self._trainer(tmp_path, self._config(tmp_path))
        t0.train_one_epoch(0)
        path = t0.save_checkpoint(add="warmsrc")
        ema = jax.tree.map(np.asarray, t0.state.ema_params)
        raw = jax.tree.map(np.asarray, t0.state.params)

        t1 = self._trainer(
            tmp_path,
            self._config(tmp_path, ckpt_resume=path, weights_only=True,
                         ema_decay=0.0),
        )
        assert int(t1.state.step) == 0  # no step/opt_state carried over
        assert t1._start_epoch == 0
        _allclose_tree(t1.state.params, ema, rtol=0, atol=0)
        # and NOT the raw params (EMA preferred for the warm start)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(t1.state.params),
                            jax.tree.leaves(raw))
        )

    def test_trainer_rejects_weights_only_auto_resume(self, tmp_path):
        # the guard lives at the MECHANISM too: a programmatic Trainer
        # with both would silently restart from scratch on every
        # "auto-resume" — refuse at construction
        t0 = self._trainer(tmp_path, self._config(tmp_path))
        t0.train_one_epoch(0)
        ckpt_dir = str(tmp_path / "logs_auto")
        import os

        os.makedirs(ckpt_dir, exist_ok=True)
        from rot_mvgaze_tpu.train.checkpoints import save_state

        save_state(os.path.join(ckpt_dir, "ckpt.msgpack"),
                   jax.device_get(t0.state))
        with pytest.raises(ValueError, match="contradicts auto_resume"):
            self._trainer(
                tmp_path,
                self._config(tmp_path, weights_only=True,
                             auto_resume_dir=ckpt_dir),
            )

    def test_cli_weights_only_validation(self, tmp_path):
        from rot_mvgaze_tpu.cli.main import build_experiment, get_parser

        base = ["--mode", "train", "--exp_name", "mpiinv_known",
                "--output_dir", str(tmp_path / "logs")]
        with pytest.raises(SystemExit, match="weights_only needs"):
            build_experiment(get_parser().parse_args(
                base + ["--weights_only", "true"]))
        with pytest.raises(SystemExit, match="contradicts"):
            build_experiment(get_parser().parse_args(
                base + ["--weights_only", "true", "--ckpt_resume", "x.msgpack",
                        "--auto_resume_dir", str(tmp_path)]))

    def test_invalid_decay_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="ema_decay"):
            self._trainer(tmp_path, self._config(tmp_path, ema_decay=1.0))

    def test_cli_rejects_invalid_decay(self, tmp_path):
        from rot_mvgaze_tpu.cli.main import build_experiment, get_parser

        args = get_parser().parse_args(
            [
                "--mode", "train", "--exp_name", "mpiinv_known",
                "--output_dir", str(tmp_path / "logs"),
                "--ema_decay", "1.5",
            ]
        )
        with pytest.raises(SystemExit, match="ema_decay"):
            build_experiment(args)
