"""End-to-end trainer tests on synthetic data (tiny model, CPU)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
from types import SimpleNamespace

from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset
from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.train import Trainer
from rot_mvgaze_tpu.train.schedule import cyclic_triangular2


def _make_config(tmp_path, **overrides):
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
    )
    cfg.update(overrides)
    return SimpleNamespace(**cfg)


@pytest.fixture
def loaders(tmp_path):
    root = tmp_path / "data"
    root.mkdir()
    write_synthetic_dataset(str(root), ["s00.h5"], n_frames=2, image_size=32)
    train_ds = GazeDataset("xgaze", str(root), "bgr", ["s00.h5"], seed=0)
    test_ds = GazeDataset("mpiinv", str(root), "rgb", ["s00.h5"], seed=0)
    return (
        BatchLoader(train_ds, batch_size=6, shuffle=True, drop_last=True),
        BatchLoader(test_ds, batch_size=6),
    )


def _metrics():
    return IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5)


class TestSchedule:
    def test_triangular2_shape(self):
        sched = cyclic_triangular2(1e-6, 1e-3, step_size_up=10, step_size_down=10)
        lrs = [float(sched(t)) for t in range(41)]
        assert lrs[0] == pytest.approx(1e-6)
        assert lrs[10] == pytest.approx(1e-3)  # peak of first cycle
        assert lrs[20] == pytest.approx(1e-6)  # back to base
        # second cycle amplitude halved (triangular2)
        assert lrs[30] == pytest.approx(1e-6 + (1e-3 - 1e-6) * 0.5)

    def test_epoch_stepping_quirk(self):
        sched = cyclic_triangular2(
            0.0, 1.0, step_size_up=10, step_size_down=10, steps_per_epoch=100
        )
        # within one epoch the LR is frozen
        assert float(sched(0)) == float(sched(99))
        assert float(sched(100)) == pytest.approx(0.1)


class TestTrainerEndToEnd:
    def test_train_one_epoch_and_eval(self, tmp_path, loaders):
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=2)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)

        err0 = trainer.test(-1)
        assert np.isfinite(err0) and err0 > 0

        trainer.train_one_epoch(0)
        assert trainer.train_iter == len(train_loader)

        err1 = trainer.test(0)
        assert np.isfinite(err1)

        # observability surface
        assert os.path.exists(os.path.join(trainer.output_dir, "test_results.txt"))
        assert os.path.exists(os.path.join(trainer.output_dir, "config.yaml"))
        tb_dir = os.path.join(trainer.output_dir, "tensorboard")
        assert any(f.startswith("events.out.tfevents") for f in os.listdir(tb_dir))

    def test_loss_decreases_on_overfit(self, tmp_path, loaders):
        """Sanity: repeated steps on the same tiny set reduce the loss."""
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path, scheduler_step="iteration", epochs=1)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)

        import jax

        from rot_mvgaze_tpu.train.steps import make_train_step

        batch = next(iter(train_loader))
        batch = jax.tree.map(jnp.asarray, batch)
        losses = []
        # fixed PRNG key -> deterministic augmentation -> clean overfit
        # signal (the Trainer's own step folds the key by state.step, so
        # build an unfolded step here)
        step = jax.jit(
            make_train_step(
                model, _metrics(), trainer.tx,
                image_size=32, schedule=trainer.schedule,
            ),
            donate_argnums=(0,),
        )
        for _ in range(10):
            trainer.state, stats = step(
                trainer.state, batch, jax.random.PRNGKey(0)
            )
            losses.append(float(stats["loss_gaze"]))
        assert losses[-1] < losses[0], losses

    def test_checkpoint_roundtrip(self, tmp_path, loaders):
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        path = trainer.save_checkpoint(add="unit")

        cfg2 = _make_config(tmp_path, ckpt_resume=path)
        trainer2 = Trainer(cfg2, model, _metrics(), train_loader, test_loader)
        a = np.asarray(
            trainer.state.params["backbone"]["conv1"]["kernel"]
        )
        b = np.asarray(trainer2.state.params["backbone"]["conv1"]["kernel"])
        np.testing.assert_array_equal(a, b)

    def test_training_is_deterministic_given_seed(self, tmp_path, loaders):
        """Two identical runs (same seed, same data) must produce identical
        parameters — guards loader ordering, PRNG threading, and any
        nondeterministic reduction sneaking into the step."""
        import jax

        def run():
            train_loader, test_loader = loaders
            cfg = _make_config(tmp_path, scheduler_step="iteration")
            model = FeatRotationSymm(backbone_depth=18, num_iter=1)
            trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
            train_loader.epoch = 0  # reset shuffle epoch between runs
            trainer.train_one_epoch(0)
            return jax.device_get(trainer.state.params)

        p1, p2 = run(), run()
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_keep_last_n_checkpoint_retention(self, tmp_path, loaders):
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path, keep_last_n=2)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        for i in range(4):
            trainer.save_checkpoint(add=f"epoch_{i:02d}")
        kept = sorted(os.listdir(trainer.ckpt_dir))
        assert kept == ["epoch_02.msgpack", "epoch_03.msgpack"], kept

    def test_bf16_training_evals_in_f32(self, tmp_path, loaders):
        """With bf16 compute (the CLI default), eval must still run f32 —
        the parity metric cannot absorb bf16 forward rounding."""
        import jax

        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path)
        model16 = FeatRotationSymm(
            backbone_depth=18, num_iter=1, dtype=jnp.bfloat16
        )
        t16 = Trainer(cfg, model16, _metrics(), train_loader, test_loader)
        model32 = FeatRotationSymm(backbone_depth=18, num_iter=1)
        t32 = Trainer(
            cfg, model32, _metrics(), train_loader, test_loader,
            init_variables={
                "params": jax.device_get(t16.state.params),
                "batch_stats": jax.device_get(t16.state.batch_stats),
            },
        )
        e16 = t16.test(-1)
        e32 = t32.test(-1)
        assert e16 == pytest.approx(e32, abs=1e-9)

    def test_export_torch_checkpoint_is_strict_loadable(self, tmp_path, loaders):
        """The exported .pth.tar must carry the keys the reference's
        load_state_dict(strict=True) requires but never uses
        (num_batches_tracked, backbone fc.*)."""
        torch = pytest.importorskip("torch")
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        path = trainer.export_torch_checkpoint(str(tmp_path / "export.pth.tar"))
        sd = torch.load(path, weights_only=True)
        assert any(k.endswith("num_batches_tracked") for k in sd)
        assert "_feat_extractor.0.fc.weight" in sd

    def test_eval_matches_reference_metric_definition(self, tmp_path, loaders):
        """test() must equal float64 numpy angular error over collected preds."""
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        err = trainer.test(-1)
        with open(os.path.join(trainer.output_dir, "test_results.txt")) as f:
            logged = float(f.read().strip().split("error: ")[1])
        assert err == pytest.approx(logged)


class TestFailureRecovery:
    def test_full_state_resume(self, tmp_path, loaders):
        """msgpack checkpoints restore optimizer state and step exactly."""
        import jax

        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)

        batch = jax.tree.map(jnp.asarray, next(iter(train_loader)))
        for i in range(3):
            trainer.state, _ = trainer._train_step(
                trainer.state, batch, jax.random.PRNGKey(i)
            )
        path = trainer.save_checkpoint(add="step3")

        cfg2 = _make_config(tmp_path, ckpt_resume=path)
        trainer2 = Trainer(cfg2, model, _metrics(), train_loader, test_loader)
        assert int(trainer2.state.step) == 3
        # TB x-axis continues at the restored step: restarting train_iter at
        # 0 re-emits steps 0..N over the earlier run's curves (r4 batch 6)
        assert trainer2.train_iter == 3
        a = jax.tree.leaves(trainer.state.opt_state)
        b = jax.tree.leaves(trainer2.state.opt_state)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_auto_resume_dir_picks_latest(self, tmp_path, loaders):
        import time

        from rot_mvgaze_tpu.train.checkpoints import find_latest_checkpoint

        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        p1 = trainer.save_checkpoint(add="old")
        time.sleep(0.05)
        p2 = trainer.save_checkpoint(add="new")
        assert find_latest_checkpoint(trainer.ckpt_dir) == p2

        cfg3 = _make_config(tmp_path, auto_resume_dir=trainer.ckpt_dir)
        trainer3 = Trainer(cfg3, model, _metrics(), train_loader, test_loader)
        assert trainer3._resume_path == p2

    def test_test_mode_refuses_missing_checkpoint(self, tmp_path, loaders):
        # mode=test with an auto_resume_dir that holds no *.msgpack must
        # raise instead of silently scoring freshly-initialized weights
        # (the reference fails the same way on a required --ckpt_resume,
        # /root/reference/main.py:253-255).
        train_loader, test_loader = loaders
        empty = tmp_path / "empty_ckpts"
        empty.mkdir()
        cfg = _make_config(tmp_path, mode="test", auto_resume_dir=str(empty))
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        with pytest.raises(FileNotFoundError, match="no .*msgpack"):
            Trainer(cfg, model, _metrics(), train_loader, test_loader)

    def test_preemption_signal_saves_checkpoint(self, tmp_path, loaders):
        import os
        import signal

        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path, epochs=1)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)

        # simulate preemption arriving right before training starts
        orig_test = trainer.test

        def test_then_signal(epoch):
            err = orig_test(epoch)
            os.kill(os.getpid(), signal.SIGTERM)
            return err

        trainer.test = test_then_signal
        result = trainer.train()
        assert np.isnan(result)
        saved = os.listdir(trainer.ckpt_dir)
        assert any(f.startswith("preempt_") for f in saved), saved

    def test_signal_during_final_eval_still_saves(self, tmp_path, loaders):
        """A signal landing during the LAST epoch's eval used to be dropped
        silently: the handler printed 'checkpointing at next step boundary'
        but no boundary check ran after that eval, so the run could exit
        with no checkpoint at all (observed in a real CLI drive with
        save_epoch > epochs)."""
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path, epochs=1, save_epoch=99)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        orig_test = trainer.test

        def test_with_late_signal(epoch):
            err = orig_test(epoch)
            if epoch == 0:  # the final epoch's eval
                trainer._preempted = True
            return err

        trainer.test = test_with_late_signal
        err = trainer.train()
        # training COMPLETED (finite error), and the promise held anyway
        assert np.isfinite(err)
        assert os.path.exists(
            os.path.join(trainer.ckpt_dir, "preempt_final.msgpack")
        )

    def test_signal_during_midrun_eval_exits_at_boundary(
        self, tmp_path, loaders
    ):
        """A signal during a mid-run eval exits at the NEXT epoch boundary
        without training any extra step (the loop-top check), so the saved
        state is exactly the evaluated one."""
        train_loader, test_loader = loaders
        spe = len(train_loader)
        cfg = _make_config(tmp_path, epochs=3, save_epoch=99)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        orig_test = trainer.test

        def test_with_signal(epoch):
            err = orig_test(epoch)
            if epoch == 0:  # after the first epoch's eval
                trainer._preempted = True
            return err

        trainer.test = test_with_signal
        err = trainer.train()
        assert np.isnan(err)
        assert int(trainer.state.step) == spe  # no extra step trained
        assert os.path.exists(
            os.path.join(trainer.ckpt_dir, "preempt_epoch_01.msgpack")
        )


class TestXlaCompilerOptions:
    """--xla_compiler_options plumbing (r3): JSON dict of per-executable XLA
    options passed to the train-step jit — the only route to xla_tpu_* flags
    over a tunneled backend (docs/PERF.md r3 sweep). CPU tests cover the
    parse/validation wiring; option efficacy is measured on the real chip
    (scripts/bench_xla_flags.py)."""

    def test_invalid_json_raises(self, tmp_path, loaders):
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path, xla_compiler_options="{not json")
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        with pytest.raises(ValueError, match="not valid JSON"):
            Trainer(cfg, model, _metrics(), train_loader, test_loader)

    def test_non_dict_raises(self, tmp_path, loaders):
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path, xla_compiler_options='["a"]')
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        with pytest.raises(ValueError, match="JSON object"):
            Trainer(cfg, model, _metrics(), train_loader, test_loader)

    def test_empty_and_absent_are_noops(self, tmp_path, loaders):
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path, xla_compiler_options="{}")
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        trainer.train_one_epoch(0)
        assert trainer.train_iter == len(train_loader)

    def test_cli_flag_parses(self):
        from rot_mvgaze_tpu.cli.main import get_parser

        args, _ = get_parser().parse_known_args(
            ["--exp_name", "xgaze", "--xla_compiler_options",
             '{"xla_tpu_autotune_dots": "true"}']
        )
        assert json.loads(args.xla_compiler_options) == {
            "xla_tpu_autotune_dots": "true"
        }


def test_params_only_checkpoint_rejected_for_bn_model():
    """Pairing trained params with freshly-initialized BN statistics makes
    eval garbage silently; the load must refuse instead."""
    from rot_mvgaze_tpu.train.checkpoints import variables_from_tree

    tree = {"params": {"w": np.zeros(3)}}
    template = {"params": {}, "batch_stats": {"bn": {"mean": np.zeros(3)}}}
    with pytest.raises(ValueError, match="batch_stats"):
        variables_from_tree(tree, template)
    # a genuinely BN-free template still loads fine
    out = variables_from_tree(tree, {"params": {}, "batch_stats": {}})
    assert out["batch_stats"] == {}


class TestAtomicCheckpointSave:
    """save_state must be atomic (tmp + fsync + rename): a preemption
    mid-write used to leave a truncated .msgpack with the newest mtime,
    which find_latest_checkpoint would then select and every --auto_resume
    restart would crash on (r4 review batch 5)."""

    def test_failed_save_preserves_previous_checkpoint(self, tmp_path):
        import glob as _glob

        from rot_mvgaze_tpu.train.checkpoints import restore_tree, save_state

        path = str(tmp_path / "ckpt.msgpack")
        save_state(path, {"a": np.arange(4, dtype=np.float32)})
        before = open(path, "rb").read()

        class Unserializable:
            pass

        with pytest.raises(Exception):
            save_state(path, {"a": Unserializable()})
        # the target file is untouched and still parses; no tmp litter
        assert open(path, "rb").read() == before
        np.testing.assert_array_equal(
            restore_tree(path)["a"], np.arange(4, dtype=np.float32)
        )
        assert _glob.glob(str(tmp_path / "*.tmp.*")) == []

    def test_tmp_files_never_match_checkpoint_glob(self, tmp_path):
        # find_latest_checkpoint globs *.msgpack; in-flight temp names must
        # not match it (a crash between write and rename leaves only .tmp.*)
        from rot_mvgaze_tpu.train.checkpoints import find_latest_checkpoint

        (tmp_path / "ckpt.msgpack.tmp.123").write_bytes(b"partial")
        assert find_latest_checkpoint(str(tmp_path)) is None


class TestRound4Batch6Fixes:
    def test_config_snapshot_survives_unrepresentable_values(
        self, tmp_path, loaders
    ):
        """A config entry whose CONTAINER holds a non-YAML-representable
        value (Path inside a list) must be dropped from the snapshot, not
        crash Trainer.__init__ in yaml.safe_dump (r4 batch 6)."""
        from pathlib import Path

        import yaml

        train_loader, test_loader = loaders
        cfg = _make_config(
            tmp_path,
            subjects=[Path("subject0000.h5")],  # list of Paths: not safe_dump-able
            note="keep-me",
        )
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        snap = yaml.safe_load(
            open(os.path.join(trainer.output_dir, "config.yaml"))
        )
        assert snap["note"] == "keep-me"
        assert "subjects" not in snap

    def test_steps_per_epoch_matches_loader_length(self, tmp_path):
        """steps_per_epoch must equal the ACTUAL optimizer steps per epoch
        (len(loader)), not floor(n/bs): with a non-drop_last loader the
        'epoch'-mode schedule position would drift ahead of the reference's
        once-per-epoch CyclicLR.step() (r4 batch 6)."""
        root = tmp_path / "d"
        root.mkdir()
        write_synthetic_dataset(str(root), ["s00.h5"], n_frames=2, image_size=32)
        ds = GazeDataset("xgaze", str(root), "bgr", ["s00.h5"], seed=0)
        # 36 samples, bs=10, no drop_last -> 4 batches (ceil), floor is 3
        loader = BatchLoader(ds, batch_size=10)
        assert len(loader) == 4
        trainer = Trainer(
            _make_config(tmp_path, batch_size=10),
            FeatRotationSymm(backbone_depth=18, num_iter=1),
            _metrics(), loader, loader,
        )
        assert trainer.steps_per_epoch == 4

    def test_to_local_numpy_preview_smaller_than_process_count(self):
        """Replicated preview arrays with fewer rows than processes must
        not slice to empty (make_image_grid crashes on 0 rows) — r4
        batch 6."""
        import jax as _jax

        class FakeReplicated:
            is_fully_replicated = True

            def __init__(self, a):
                self._a = a
                self.shape = a.shape

            def __array__(self, dtype=None, copy=None):
                return self._a

        a = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        orig_pc, orig_pi = _jax.process_count, _jax.process_index
        _jax.process_count = lambda: 16
        _jax.process_index = lambda: 7
        try:
            out = Trainer._to_local_numpy(FakeReplicated(a))
        finally:
            _jax.process_count, _jax.process_index = orig_pc, orig_pi
        assert out.shape[0] == 8  # shared preview, never empty

    def test_hdf5_handles_pruned_after_worker_threads_die(self, tmp_path):
        """Per-epoch thread pools must not leak h5 handles: dead threads'
        registrations are pruned when new threads open (r4 batch 6 — the
        h5py fallback path used to leak num_threads x num_files fds per
        epoch until the process hit its fd limit)."""
        from concurrent.futures import ThreadPoolExecutor

        root = tmp_path / "d"
        root.mkdir()
        write_synthetic_dataset(str(root), ["s00.h5"], n_frames=2, image_size=32)
        ds = GazeDataset("xgaze", str(root), "bgr", ["s00.h5"], seed=0)

        def read_some(_):
            return ds[0]["idx_0"]

        for _epoch in range(4):  # fresh pool per epoch, like the BatchLoader
            with ThreadPoolExecutor(max_workers=4) as ex:
                list(ex.map(read_some, range(8)))
        # trigger one more registration from a fresh thread: prune runs then
        with ThreadPoolExecutor(max_workers=1) as ex:
            list(ex.map(read_some, range(1)))
        live = [e for e in ds._open_handles if e[0].is_alive()]
        # bounded by LIVE threads (main may hold one too), not 4 epochs x 4
        assert len(ds._open_handles) <= len(live) + 1
        assert len(ds._open_handles) < 5
        ds.close()


class TestShuffledEvalBreakdown:
    def test_per_subject_correct_with_shuffled_test_loader(self, tmp_path):
        """Review-batch-7 regression: the eval-row replay must reflect the
        epoch the eval CONSUMED, not the loader's post-iteration epoch
        counter (which the iterator's finally block already advanced). A
        shuffle=True test loader makes the two differ; the per-subject
        table must still appear AND group each error under the right file
        — with two files sharing an identical per-file row layout, idx_0
        alone validates against any permutation, so a wrong-epoch replay
        would mis-assign errors silently."""
        root = tmp_path / "data"
        root.mkdir()
        write_synthetic_dataset(
            str(root), ["s00.h5", "s01.h5"], n_frames=2, image_size=32
        )
        test_ds = GazeDataset(
            "mpiinv", str(root), "rgb", ["s00.h5", "s01.h5"], seed=0
        )
        trainer = Trainer(
            _make_config(tmp_path),
            FeatRotationSymm(backbone_depth=18, num_iter=1),
            _metrics(),
            None,
            BatchLoader(test_ds, batch_size=6, shuffle=True, seed=7),
        )
        trainer.test(-1)
        detail = trainer.test_breakdown()
        assert detail["per_subject"] is not None, (
            "row replay failed under a shuffled test loader"
        )
        assert set(detail["per_subject"]) == {0, 1}
        assert (
            sum(s["n"] for s in detail["per_subject"].values())
            == detail["n"]
        )
        # independent per-file grouping from the loader's own record of the
        # consumed order: means must match exactly
        rows = trainer.test_loader.last_epoch_order
        errs = trainer._last_eval_errors
        for f in (0, 1):
            mask = np.asarray(
                [test_ds.idx_to_kv[int(r)][0] == f for r in rows[: len(errs)]]
            )
            assert detail["per_subject"][f]["error"] == pytest.approx(
                float(np.mean(errs[mask])), abs=1e-12
            )
            assert detail["per_subject"][f]["n"] == int(mask.sum())
        test_ds.close()


class TestEpochResume:
    """A preemption restart must run the REMAINING epochs (the restored
    step says how many are done), not `--epochs` more, and must continue
    the original run's per-epoch shuffle sequence."""

    def _fresh_loaders(self, tmp_path, batch_size=6):
        # fresh loader objects = a fresh process: epoch counters at 0
        root = tmp_path / "data"
        train_ds = GazeDataset("xgaze", str(root), "bgr", ["s00.h5"], seed=0)
        test_ds = GazeDataset("mpiinv", str(root), "rgb", ["s00.h5"], seed=0)
        return (
            BatchLoader(
                train_ds, batch_size=batch_size, shuffle=True, drop_last=True
            ),
            BatchLoader(test_ds, batch_size=6),
        )

    def test_resume_runs_remaining_epochs(self, tmp_path, loaders):
        train_loader, test_loader = loaders
        spe = len(train_loader)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        cfg = _make_config(tmp_path, epochs=3, save_epoch=99)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        assert trainer._start_epoch == 0
        trainer.train_one_epoch(0)
        assert int(trainer.state.step) == spe
        path = trainer.save_checkpoint(add="after_epoch_1")

        tl2, el2 = self._fresh_loaders(tmp_path)
        assert tl2.epoch == 0
        cfg2 = _make_config(
            tmp_path, epochs=3, save_epoch=99, ckpt_resume=path
        )
        trainer2 = Trainer(cfg2, model, _metrics(), tl2, el2)
        assert trainer2._start_epoch == 1
        # shuffle continuation: the fresh loader is synced to the epoch the
        # original run would be on — without this it replays epoch 0's
        # rng((seed, 0)) permutation after every restart
        assert tl2.epoch == 1
        err = trainer2.train()
        # epochs 2..3 only: two more epochs of steps, not three
        assert int(trainer2.state.step) == 3 * spe
        assert np.isfinite(err)

    def test_midepoch_resume_is_step_exact(self, tmp_path, loaders):
        """A mid-epoch preemption resume fast-forwards past the batches the
        checkpointed run already consumed: the total optimizer step count
        equals an uninterrupted run's exactly (no re-run epoch inflating
        state.step, so the 'epoch'-mode LR boundaries stay aligned and a
        SECOND mid-epoch resume derives its position correctly too)."""
        train_loader, test_loader = loaders
        spe = len(train_loader)
        assert spe >= 3
        k = spe // 2
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        cfg = _make_config(tmp_path, epochs=2, save_epoch=99)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        # deterministic "preemption" after k optimizer steps, through the
        # real agreement check the signal path uses
        trainer._preempt_agreed = lambda: trainer.train_iter >= k
        err = trainer.train()
        assert np.isnan(err)  # preempted runs return nan
        assert int(trainer.state.step) == k
        path = os.path.join(trainer.ckpt_dir, "preempt_epoch_00.msgpack")
        assert os.path.exists(path)

        tl2, el2 = self._fresh_loaders(tmp_path)
        cfg2 = _make_config(
            tmp_path, epochs=2, save_epoch=99, ckpt_resume=path
        )
        trainer2 = Trainer(cfg2, model, _metrics(), tl2, el2)
        assert trainer2._start_epoch == 0
        assert trainer2._start_batch == k
        assert tl2.epoch == 0
        err = trainer2.train()
        assert np.isfinite(err)
        # step-exact: k checkpointed + (spe - k) resumed + spe epoch-2
        assert int(trainer2.state.step) == 2 * spe

    def test_completed_checkpoint_evaluates_only(self, tmp_path, loaders):
        train_loader, test_loader = loaders
        spe = len(train_loader)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        cfg = _make_config(tmp_path, epochs=2, save_epoch=99)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        trainer.state = trainer.state.replace(step=2 * spe)
        trainer._epoch_cur, trainer._epoch_step = 2, 0
        path = trainer.save_checkpoint(add="complete")

        tl2, el2 = self._fresh_loaders(tmp_path)
        cfg2 = _make_config(
            tmp_path, epochs=2, save_epoch=99, ckpt_resume=path
        )
        trainer2 = Trainer(cfg2, model, _metrics(), tl2, el2)
        assert trainer2._start_epoch == 2
        err = trainer2.train()
        assert np.isfinite(err)
        # no further training happened
        assert int(trainer2.state.step) == 2 * spe

    def test_changed_batch_size_boundary_resume_uses_saved_epochs(
        self, tmp_path, loaders
    ):
        """epochs_done is stored explicitly, so resuming with a different
        batch size still counts completed epochs exactly (the old
        step // steps_per_epoch derivation would divide by the NEW epoch
        length and silently mis-count)."""
        train_loader, test_loader = loaders
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        cfg = _make_config(tmp_path, epochs=3, save_epoch=99)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        trainer.train_one_epoch(0)
        path = trainer.save_checkpoint(add="after_epoch_1")

        # halve the batch size: epoch length doubles; floor derivation
        # would claim 0 epochs done
        tl2, el2 = self._fresh_loaders(tmp_path, batch_size=3)
        assert len(tl2) != len(train_loader)
        cfg2 = _make_config(
            tmp_path, epochs=3, save_epoch=99, batch_size=3, ckpt_resume=path
        )
        trainer2 = Trainer(cfg2, model, _metrics(), tl2, el2)
        assert trainer2._start_epoch == 1
        assert trainer2._start_batch == 0

    def test_changed_batch_size_midepoch_restarts_epoch(
        self, tmp_path, loaders, capsys
    ):
        """A saved mid-epoch batch position is meaningless under a different
        batching of the permutation — the interrupted epoch restarts from
        its first batch, loudly."""
        train_loader, test_loader = loaders
        spe = len(train_loader)
        k = spe // 2
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        cfg = _make_config(tmp_path, epochs=2, save_epoch=99)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        trainer._preempt_agreed = lambda: trainer.train_iter >= k
        trainer.train()
        path = os.path.join(trainer.ckpt_dir, "preempt_epoch_00.msgpack")

        tl2, el2 = self._fresh_loaders(tmp_path, batch_size=3)
        cfg2 = _make_config(
            tmp_path, epochs=2, save_epoch=99, batch_size=3, ckpt_resume=path
        )
        trainer2 = Trainer(cfg2, model, _metrics(), tl2, el2)
        assert trainer2._start_epoch == 0
        assert trainer2._start_batch == 0  # reset: position not replayable
        assert "steps_per_epoch changed" in capsys.readouterr().out

    def test_legacy_checkpoint_without_meta_falls_back_to_floor(
        self, tmp_path, loaders
    ):
        """Pre-metadata checkpoints (bare TrainState msgpack) resume via
        step // steps_per_epoch — exact for epoch-boundary saves."""
        from rot_mvgaze_tpu.train.checkpoints import save_state

        train_loader, test_loader = loaders
        spe = len(train_loader)
        model = FeatRotationSymm(backbone_depth=18, num_iter=1)
        cfg = _make_config(tmp_path, epochs=3, save_epoch=99)
        trainer = Trainer(cfg, model, _metrics(), train_loader, test_loader)
        trainer.train_one_epoch(0)
        path = str(tmp_path / "legacy.msgpack")
        save_state(path, trainer.state)  # the old format: no epoch_meta

        tl2, el2 = self._fresh_loaders(tmp_path)
        cfg2 = _make_config(
            tmp_path, epochs=3, save_epoch=99, ckpt_resume=path
        )
        trainer2 = Trainer(cfg2, model, _metrics(), tl2, el2)
        assert trainer2._start_epoch == 1
        assert trainer2._start_batch == 0
        assert int(trainer2.state.step) == spe  # full state still restored


class TestProfilerCapture:
    def test_profile_steps_captures_one_trace(self, tmp_path, loaders):
        """--profile_steps N: exactly one steady-state device trace is
        captured into <output_dir>/profile (step 0's compile excluded), and
        later epochs do not re-trace."""
        train_loader, test_loader = loaders
        cfg = _make_config(tmp_path, profile_steps=2, epochs=2)
        trainer = Trainer(
            cfg,
            FeatRotationSymm(backbone_depth=18, num_iter=1),
            _metrics(),
            train_loader,
            test_loader,
        )
        trainer.train_one_epoch(0)
        assert trainer._profiled and not trainer._profile_active
        profile_dir = os.path.join(cfg.output_dir, "profile")
        files = [
            os.path.join(d, f)
            for d, _, fs in os.walk(profile_dir)
            for f in fs
        ]
        assert files, f"no trace files written under {profile_dir}"
        # one trace per run: epoch 2 must not open a second capture
        trainer.train_one_epoch(1)
        assert trainer._profiled and not trainer._profile_active
        files_after = [
            os.path.join(d, f)
            for d, _, fs in os.walk(profile_dir)
            for f in fs
        ]
        assert sorted(files_after) == sorted(files)

    def test_cli_profile_dir_requires_profile_steps(self, tmp_path):
        """--profile_dir without --profile_steps used to run to completion
        and leave an absent trace dir with no hint; it is now a fast-fail
        argument error."""
        from rot_mvgaze_tpu.cli.main import main

        with pytest.raises(SystemExit):
            main(
                [
                    "--mode", "train", "--exp_name", "mpiinv_known",
                    "--output_dir", str(tmp_path),
                    "--profile_dir", str(tmp_path / "trace"),
                ]
            )

    def test_profile_fires_with_single_batch_epochs(self, tmp_path, loaders):
        """The trigger counts EXECUTED steps process-wide, not the position
        within an epoch — with one batch per epoch, an 'i == 1' trigger
        would never fire and --profile_steps would silently capture
        nothing."""
        train_loader, test_loader = loaders
        root = tmp_path / "data"
        ds = GazeDataset("xgaze", str(root), "bgr", ["s00.h5"], seed=0)
        one_batch = BatchLoader(
            ds, batch_size=len(ds), shuffle=True, drop_last=True
        )
        assert len(one_batch) == 1
        cfg = _make_config(tmp_path, profile_steps=1, epochs=2)
        trainer = Trainer(
            cfg,
            FeatRotationSymm(backbone_depth=18, num_iter=1),
            _metrics(),
            one_batch,
            test_loader,
        )
        trainer.train_one_epoch(0)  # the compile step: no trace yet
        assert not trainer._profiled
        trainer.train_one_epoch(1)  # second executed step: traced
        assert trainer._profiled and not trainer._profile_active
        profile_dir = os.path.join(cfg.output_dir, "profile")
        assert any(fs for _, _, fs in os.walk(profile_dir))

    def test_short_epoch_closes_trace(self, tmp_path, loaders):
        """An epoch ending before profile_steps steps must stop the trace
        (leaving the profiler running through eval would crash the next
        start_trace and bloat the capture)."""
        train_loader, test_loader = loaders
        # 36 samples / batch 6 = 6 steps; request far more
        cfg = _make_config(tmp_path, profile_steps=99)
        trainer = Trainer(
            cfg,
            FeatRotationSymm(backbone_depth=18, num_iter=1),
            _metrics(),
            train_loader,
            test_loader,
        )
        trainer.train_one_epoch(0)
        assert trainer._profiled and not trainer._profile_active
        trainer.test(-1)  # profiler must be fully closed here
