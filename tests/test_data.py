"""Data-layer tests over synthetic HDF5 fixtures (no real datasets needed)."""

import numpy as np
import pytest

from rot_mvgaze_tpu.data import (
    CAMERA_TAGS,
    BatchLoader,
    GazeDataset,
    build_pair_index,
    write_synthetic_h5,
)
from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset


class TestCameraTags:
    def test_splits(self):
        """Exact splits of /root/reference/dataset/gaze.py:39-44."""
        assert CAMERA_TAGS["all"] == list(range(18))
        assert CAMERA_TAGS["novel_test"] == [2, 5, 8, 11, 14, 17]
        assert sorted(CAMERA_TAGS["novel_train"] + CAMERA_TAGS["novel_test"]) == list(
            range(18)
        )
        assert len(CAMERA_TAGS["novel_train"]) == 12


class TestPairIndex:
    def test_all_cameras(self):
        idx = build_pair_index([36], "all")
        assert len(idx) == 36  # every row valid, every frame has partners
        for file_i, a, b in idx:
            assert file_i == 0
            assert a // 18 == b // 18  # same frame
            assert a != b

    def test_novel_test_split(self):
        idx = build_pair_index([36], "novel_test")
        cams = set(CAMERA_TAGS["novel_test"])
        assert len(idx) == 2 * len(cams)
        for _, a, b in idx:
            assert a % 18 in cams and b % 18 in cams

    def test_deterministic_given_seed(self):
        a = build_pair_index([54], "all", seed=7)
        b = build_pair_index([54], "all", seed=7)
        c = build_pair_index([54], "all", seed=8)
        assert a == b
        assert a != c

    def test_single_camera_has_no_pairs(self):
        # a frame with only one valid camera yields no sample
        idx = build_pair_index([18], "novel_test", num_cameras=18)
        # 6 novel cams in one frame -> each has 5 partners, 6 samples
        assert len(idx) == 6


class TestLearnableCorpus:
    def test_label_decodes_from_pixels(self, tmp_path):
        """learnable=True writes a corpus whose gaze label is recoverable
        from image content (disc centroid -> pitch/yaw) — the property the
        sustained convergence run depends on."""
        import h5py

        from rot_mvgaze_tpu.data.synthetic import (
            LEARNABLE_GAZE_RANGE,
            _LEARNABLE_NORM,
        )

        S = 64
        path = str(tmp_path / "learn.h5")
        write_synthetic_h5(path, n_frames=2, image_size=S, learnable=True)
        with h5py.File(path, "r") as f:
            imgs = f["face_patch"][()]
            gaze = f["face_gaze"][()]
        assert np.all(np.abs(gaze) <= LEARNABLE_GAZE_RANGE + 1e-6)
        for img, g in zip(imgs, gaze):
            ys, xs = np.where(img[..., 0] == 255)
            assert len(ys) > 0, "no disc rendered"
            cy, cx = ys.mean(), xs.mean()
            pitch = (2 * cy / (S - 1) - 1) * _LEARNABLE_NORM
            yaw = (2 * cx / (S - 1) - 1) * _LEARNABLE_NORM
            # centroid quantization + disc clipping at borders: ~1px slack
            tol = 2.5 * _LEARNABLE_NORM / (S - 1)
            assert abs(pitch - g[0]) < tol and abs(yaw - g[1]) < tol, (
                f"decoded ({pitch:.3f},{yaw:.3f}) vs label {g}"
            )

    def test_default_corpus_unchanged(self, tmp_path):
        # learnable=False must keep producing the exact legacy bytes —
        # pair-index/parity goldens elsewhere depend on the noise draws
        a = str(tmp_path / "a.h5")
        write_synthetic_h5(a, n_frames=1, image_size=8, seed=3)
        import h5py

        with h5py.File(a, "r") as f:
            imgs = f["face_patch"][()]
        rng = np.random.default_rng(3)
        expect = rng.integers(0, 256, (18, 8, 8, 3), dtype=np.uint8)
        np.testing.assert_array_equal(imgs, expect)


class TestGazeDataset:
    @pytest.fixture
    def root(self, tmp_path):
        write_synthetic_dataset(str(tmp_path), ["s00.h5", "s01.h5"], n_frames=2)
        return str(tmp_path)

    def test_sample_contract(self, root):
        ds = GazeDataset(
            "xgaze", root, "bgr", ["s00.h5", "s01.h5"], camera_tag="all", stereo=True
        )
        assert len(ds) == 2 * 2 * 18
        s = ds[0]
        assert s["img_0"].dtype == np.uint8
        assert s["img_0"].shape == (32, 32, 3)
        assert s["gt_gaze"].shape == (2,)
        assert s["head_pose_0"].shape == (2,)
        assert {"img_1", "gt_gaze_1", "head_pose_1", "idx_1"} <= set(s)
        ds.close()

    def test_bgr_flip(self, root):
        import h5py

        ds_bgr = GazeDataset("xgaze", root, "bgr", ["s00.h5"])
        ds_rgb = GazeDataset("xgaze", root, "rgb", ["s00.h5"])
        i0 = ds_bgr.idx_to_kv[0][1]
        with h5py.File(f"{root}/s00.h5", "r") as f:
            raw = np.asarray(f["face_patch"][i0])
        np.testing.assert_array_equal(ds_bgr[0]["img_0"], raw[..., ::-1])
        np.testing.assert_array_equal(ds_rgb[0]["img_0"], raw)

    def test_mpiinv_pitch_flip(self, root):
        import h5py

        ds = GazeDataset("mpiinv", root, "rgb", ["s00.h5"])
        i0 = ds.idx_to_kv[0][1]
        with h5py.File(f"{root}/s00.h5", "r") as f:
            raw_hp = np.asarray(f["face_head_pose"][i0], dtype=np.float64)
        got = ds[0]["head_pose_0"]
        assert got[0] == -raw_hp[0]
        assert got[1] == raw_hp[1]

    def test_non_stereo(self, root):
        ds = GazeDataset("xgaze", root, "bgr", ["s00.h5"], stereo=False)
        assert "img_1" not in ds[0]


class TestBatchLoader:
    @pytest.fixture
    def ds(self, tmp_path):
        write_synthetic_h5(str(tmp_path / "s.h5"), n_frames=3)
        return GazeDataset("xgaze", str(tmp_path), "bgr", ["s.h5"])

    def test_batch_shapes(self, ds):
        loader = BatchLoader(ds, batch_size=8)
        batches = list(loader)
        assert len(batches) == len(loader)
        b = batches[0]
        assert b["img_0"].shape == (8, 32, 32, 3)
        assert b["img_0"].dtype == np.uint8
        assert b["gt_gaze"].dtype == np.float32
        total = sum(x["img_0"].shape[0] for x in batches)
        assert total == len(ds)

    def test_drop_last(self, ds):
        loader = BatchLoader(ds, batch_size=7, drop_last=True)
        batches = list(loader)
        assert all(b["img_0"].shape[0] == 7 for b in batches)
        assert len(batches) == len(ds) // 7

    def test_shuffle_reproducible_per_epoch(self, ds):
        l1 = BatchLoader(ds, batch_size=4, shuffle=True, seed=3)
        l2 = BatchLoader(ds, batch_size=4, shuffle=True, seed=3)
        b1 = [b["idx_0"] for b in l1]
        b2 = [b["idx_0"] for b in l2]
        for a, b in zip(b1, b2):
            np.testing.assert_array_equal(a, b)
        # next epoch differs
        b1b = [b["idx_0"] for b in l1]
        assert any(
            not np.array_equal(a, b) for a, b in zip(b1, b1b)
        )

    def test_last_epoch_order_records_the_consumed_epoch(self, ds):
        """``last_epoch_order`` is the order the iteration actually
        YIELDED — not a recomputation from the loader's attributes, which
        would be off by one because ``epoch`` advances in the iterator's
        finally block. The trainer's per-subject eval breakdown replays
        rows from it (a wrong permutation there maps errors to the wrong
        subjects silently, since idx_0 alone can't disambiguate files)."""
        from rot_mvgaze_tpu.data.pipeline import epoch_order

        loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=3)
        got = np.concatenate([b["idx_0"] for b in loader])
        order = loader.last_epoch_order
        # the yielded idx_0 stream matches the recorded order exactly
        np.testing.assert_array_equal(
            got, [ds.idx_to_kv[int(r)][1] for r in order]
        )
        # and the post-iteration attributes would replay the NEXT epoch
        assert loader.epoch == 1
        next_epoch = epoch_order(len(ds), True, 3, loader.epoch, None)
        assert not np.array_equal(order, next_epoch)

    def test_skip_batches_fast_forwards_one_epoch(self, ds):
        """``skip_batches`` (step-exact mid-epoch resume) starts the next
        iteration at batch k of the SAME permutation, records only the
        yielded suffix in ``last_epoch_order``, and resets afterwards so
        subsequent epochs are full-length again."""
        full = BatchLoader(ds, batch_size=4, shuffle=True, seed=3)
        ref = [b["idx_0"] for b in full]

        loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=3)
        loader.skip_batches = 2
        got = [b["idx_0"] for b in loader]
        assert len(got) == len(ref) - 2
        for a, b in zip(got, ref[2:]):
            np.testing.assert_array_equal(a, b)
        # the recorded order is the yielded suffix (per-subject eval replay)
        np.testing.assert_array_equal(
            np.concatenate(got),
            [ds.idx_to_kv[int(r)][1] for r in loader.last_epoch_order],
        )
        # one-shot: the next epoch is full-length
        assert loader.skip_batches == 0
        assert len(list(loader)) == len(loader)

    def test_device_prefetch(self, ds):
        import jax

        from rot_mvgaze_tpu.data import device_prefetch

        loader = BatchLoader(ds, batch_size=4)
        n = 0
        for batch in device_prefetch(iter(loader), size=2):
            assert isinstance(batch["img_0"], jax.Array)
            n += 1
        assert n == len(loader)


class TestLoaderRobustness:
    def test_early_break_does_not_leak_producer(self, tmp_path):
        """Abandoning the iterator mid-epoch must stop the producer thread."""
        import threading
        import time

        write_synthetic_h5(str(tmp_path / "s.h5"), n_frames=4)
        ds = GazeDataset("xgaze", str(tmp_path), "bgr", ["s.h5"])
        loader = BatchLoader(ds, batch_size=4, prefetch=1)
        before = threading.active_count()
        it = iter(loader)
        next(it)
        it.close()  # early abandon
        time.sleep(0.5)
        assert threading.active_count() <= before + 1
        # the loader remains reusable afterwards
        total = sum(b["img_0"].shape[0] for b in loader)
        assert total == len(ds)
