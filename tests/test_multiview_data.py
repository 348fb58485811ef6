"""V-view index builder, dataset, collation, and train/eval steps."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.data import BatchLoader, MultiViewGazeDataset
from rot_mvgaze_tpu.data.pairing import (
    CAMERA_TAGS,
    build_multiview_index,
)
from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset
from rot_mvgaze_tpu.losses import IterationLoss, MultiViewL1Loss
from rot_mvgaze_tpu.models.multiview import FeatRotationMultiView
from rot_mvgaze_tpu.train.multiview_steps import (
    make_multiview_eval_step,
    make_multiview_train_step,
)
from rot_mvgaze_tpu.train.trainer import TrainState, make_optimizer


class TestMultiViewIndex:
    def test_structure(self):
        idx = build_multiview_index([36, 20], "all", n_views=4, seed=0)
        # file 0: 2 full frames -> 36 rows; file 1: one full frame + 2 rows
        # (rows 18,19 live in a frame with only 2 valid cameras -> skipped
        # for V=4, which needs 3 partners)
        assert len(idx) == 36 + 18
        for file_i, views in idx:
            assert len(views) == 4
            assert len(set(views)) == 4  # distinct
            frame = views[0] // 18
            assert all(v // 18 == frame for v in views)  # same frame

    def test_camera_split_respected(self):
        cams = set(CAMERA_TAGS["novel_test"])  # 6 cameras
        idx = build_multiview_index([36], "novel_test", n_views=3, seed=1)
        assert idx, "split with 6 cameras supports V=3"
        for _f, views in idx:
            assert all((v % 18) in cams for v in views)

    def test_impossible_n_views_raises(self):
        # novel_test has 6 valid cameras per frame; V=8 needs 7 partners —
        # NO frame can ever satisfy it, so this is a configuration error
        # (an empty dataset would train 0 steps and eval to NaN silently)
        with pytest.raises(ValueError, match="6 cameras"):
            build_multiview_index([36], "novel_test", n_views=8)

    def test_truncated_frames_skipped_not_fatal(self):
        # 6-camera split at V=6 is exactly satisfiable on full frames; the
        # truncated final frame (rows 36..39 hold only camera 2 of the
        # split) is skipped, mirroring the stereo builders' partner-less
        # skip — a SHORT file is data, not a configuration error
        idx = build_multiview_index([40], "novel_test", n_views=6, seed=0)
        assert len(idx) == 2 * 6  # two full frames only
        assert all(max(views) < 36 for _f, views in idx)

    def test_deterministic_per_seed(self):
        a = build_multiview_index([54], "all", n_views=3, seed=7)
        b = build_multiview_index([54], "all", n_views=3, seed=7)
        c = build_multiview_index([54], "all", n_views=3, seed=8)
        assert a == b
        assert a != c

    def test_rejects_v1(self):
        with pytest.raises(ValueError, match="n_views"):
            build_multiview_index([36], "all", n_views=1)


@pytest.fixture
def corpus(tmp_path):
    root = tmp_path / "data"
    root.mkdir()
    write_synthetic_dataset(str(root), ["s00.h5", "s01.h5"], n_frames=2,
                            image_size=32)
    return root


class TestMultiViewDataset:
    def test_getitem_matches_h5_rows(self, corpus):
        ds = MultiViewGazeDataset(
            "xgaze", str(corpus), "rgb", ["s00.h5", "s01.h5"], n_views=3,
            seed=0,
        )
        assert len(ds) == 2 * 2 * 18
        sample = ds[5]
        assert sample["imgs"].shape == (3, 32, 32, 3)
        assert sample["imgs"].dtype == np.uint8
        assert sample["gt_gazes"].shape == (3, 2)
        assert sample["head_poses"].shape == (3, 2)
        file_i, views = ds.idx_to_kv[5]
        with h5py.File(str(corpus / ["s00.h5", "s01.h5"][file_i]), "r") as f:
            for v, row in enumerate(views):
                np.testing.assert_array_equal(
                    sample["imgs"][v], f["face_patch"][row]
                )
                np.testing.assert_allclose(
                    sample["gt_gazes"][v], f["face_gaze"][row]
                )
        ds.close()

    def test_empty_index_raises(self, tmp_path):
        # every frame truncated below n_views rows -> zero usable samples;
        # must refuse at construction, not NaN at eval
        root = tmp_path / "tiny"
        root.mkdir()
        with h5py.File(str(root / "s00.h5"), "w") as f:
            f["face_patch"] = np.zeros((2, 32, 32, 3), np.uint8)
            f["face_gaze"] = np.zeros((2, 2), np.float32)
            f["face_head_pose"] = np.zeros((2, 2), np.float32)
        with pytest.raises(ValueError, match="no usable frame"):
            MultiViewGazeDataset(
                "xgaze", str(root), "rgb", ["s00.h5"], n_views=3, seed=0
            )

    def test_batchloader_collation(self, corpus):
        ds = MultiViewGazeDataset(
            "xgaze", str(corpus), "rgb", ["s00.h5"], n_views=3, seed=0
        )
        loader = BatchLoader(ds, batch_size=6, shuffle=True, drop_last=True)
        batch = next(iter(loader))
        assert batch["imgs"].shape == (6, 3, 32, 32, 3)
        assert batch["imgs"].dtype == np.uint8
        assert batch["gt_gazes"].dtype == np.float32
        assert batch["head_poses"].dtype == np.float32
        assert batch["idxs"].shape == (6, 3)
        assert batch["idxs"].dtype == np.int32
        ds.close()


class TestMultiViewSteps:
    def _batch(self, B=8, V=3, S=32, seed=0):
        rng = np.random.default_rng(seed)
        return {
            "imgs": rng.integers(0, 256, (B, V, S, S, 3), dtype=np.uint8),
            "gt_gazes": rng.uniform(-1, 1, (B, V, 2)).astype(np.float32),
            "head_poses": rng.uniform(-0.8, 0.8, (B, V, 2)).astype(
                np.float32
            ),
        }

    def _setup(self, V=3, S=32, lr=1e-3):
        model = FeatRotationMultiView(backbone_depth=18, num_iter=1)
        metrics = IterationLoss(
            loss=MultiViewL1Loss(rel_weight=0.01), iter_decay=0.5
        )
        tx = make_optimizer(lambda _t: lr)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            {
                "imgs": jnp.zeros((2, V, S, S, 3)),
                "rots": jnp.broadcast_to(jnp.eye(3), (2, V, 3, 3)),
            },
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
        return model, metrics, tx, state

    def test_train_step_reduces_loss_on_repeated_batch(self):
        # lr=1e-4, like the multichip dryrun: from a random init a
        # 1e-3-sized Adam step perturbs the untrained BN statistics enough
        # to spike the loss before it recovers (__graft_entry__.py).
        model, metrics, tx, state = self._setup(lr=1e-4)
        step = jax.jit(
            make_multiview_train_step(model, metrics, tx, image_size=32,
                                      fold_key_by_step=True)
        )
        batch = self._batch()
        losses = []
        for _ in range(6):
            state, stats = step(state, batch, jax.random.PRNGKey(1))
            losses.append(float(stats["loss_gaze"]))
        assert int(state.step) == 6
        assert all(np.isfinite(losses))
        # pair-averaged trend, like the dryrun's assertion
        assert (losses[-2] + losses[-1]) / 2 < (losses[0] + losses[1]) / 2, (
            losses
        )

    def test_eval_step_contract(self):
        model, _metrics, _tx, state = self._setup()
        eval_step = jax.jit(make_multiview_eval_step(model, image_size=32))
        batch = self._batch()
        out = eval_step(state.params, state.batch_stats, batch)
        assert out["pred_gaze"].shape == (8, 2)
        np.testing.assert_allclose(
            np.asarray(out["gt_gaze"]), batch["gt_gazes"][:, 0]
        )
        assert out["img_0"].shape[0] == 8
        assert bool(jnp.isfinite(out["pred_gaze"]).all())

    def test_freeze_bn_keeps_stats(self):
        model, metrics, tx, state = self._setup()
        step = jax.jit(
            make_multiview_train_step(model, metrics, tx, image_size=32,
                                      freeze_bn=True)
        )
        before = jax.tree.map(np.asarray, state.batch_stats)
        state, stats = step(state, self._batch(), jax.random.PRNGKey(1))
        assert np.isfinite(float(stats["loss_gaze"]))
        for a, b in zip(
            jax.tree.leaves(state.batch_stats), jax.tree.leaves(before)
        ):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_with_images_previews(self):
        model, metrics, tx, state = self._setup()
        step = jax.jit(
            make_multiview_train_step(model, metrics, tx, image_size=32,
                                      with_images=True,
                                      schedule=lambda t: 1e-3)
        )
        _state, stats = step(state, self._batch(), jax.random.PRNGKey(1))
        assert stats["img_0"].shape == (8, 32, 32, 3)
        assert stats["img_1"].shape == (8, 32, 32, 3)
        assert "lr" in stats
