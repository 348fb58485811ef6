"""Native (C++) packed-cache loader tests: pack format, gather correctness
vs the h5py path, async double-buffering."""

import numpy as np
import pytest

from rot_mvgaze_tpu.data import GazeDataset, write_synthetic_h5
from rot_mvgaze_tpu.data.native import (
    NativeBatchLoader,
    NativePool,
    PackedGazeDataset,
)
from rot_mvgaze_tpu.data.packed import PackedFile, pack_hdf5
from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset

needs_native = pytest.mark.skipif(
    not NativePool.available(), reason="no C++ toolchain"
)


class TestPackedFormat:
    def test_pack_roundtrip(self, tmp_path):
        import h5py

        src = str(tmp_path / "s.h5")
        write_synthetic_h5(src, n_frames=2, image_size=16)
        dst = pack_hdf5(src, str(tmp_path / "s.pack"), "xgaze", "bgr")
        pf = PackedFile(dst)
        with h5py.File(src) as f:
            raw_img = np.asarray(f["face_patch"])
            raw_gaze = np.asarray(f["face_gaze"])
            raw_pose = np.asarray(f["face_head_pose"])
        assert pf.n == 36
        np.testing.assert_array_equal(pf.images, raw_img[..., ::-1])  # BGR->RGB
        np.testing.assert_allclose(pf.gaze, raw_gaze, atol=1e-7)
        np.testing.assert_allclose(pf.head_pose, raw_pose, atol=1e-7)

    def test_mpiinv_pitch_flip_baked(self, tmp_path):
        import h5py

        src = str(tmp_path / "s.h5")
        write_synthetic_h5(src, n_frames=1, image_size=16)
        dst = pack_hdf5(src, str(tmp_path / "s.pack"), "mpiinv", "rgb")
        pf = PackedFile(dst)
        with h5py.File(src) as f:
            raw_pose = np.asarray(f["face_head_pose"])
        np.testing.assert_allclose(pf.head_pose[:, 0], -raw_pose[:, 0], atol=1e-7)
        np.testing.assert_allclose(pf.head_pose[:, 1], raw_pose[:, 1], atol=1e-7)


@needs_native
class TestNativePool:
    def test_gather_matches_numpy(self, tmp_path):
        src = str(tmp_path / "s.h5")
        write_synthetic_h5(src, n_frames=3, image_size=16)
        dst = pack_hdf5(src, str(tmp_path / "s.pack"), "xgaze", "bgr")
        pool = NativePool([dst])
        pf = PackedFile(dst)
        rng = np.random.default_rng(0)
        rows = rng.integers(0, pf.n, 40)
        out = pool.gather(np.zeros(40, np.int32), rows)
        np.testing.assert_array_equal(out["img"], pf.images[rows])
        np.testing.assert_array_equal(out["gaze"], pf.gaze[rows])
        np.testing.assert_array_equal(out["head_pose"], pf.head_pose[rows])

    def test_async_out_of_order_completion(self, tmp_path):
        """Wait(ticket) must not return until THAT ticket's buffers are
        written, even when later (smaller) tickets finish first. Regression
        test for the max-completed-ticket wait predicate: a large gather
        interleaved with many tiny ones used to be observable half-filled."""
        src = str(tmp_path / "s.h5")
        write_synthetic_h5(src, n_frames=6, image_size=32)
        dst = pack_hdf5(src, str(tmp_path / "s.pack"), "xgaze", "rgb")
        pool = NativePool([dst], n_threads=4)
        pf = PackedFile(dst)
        rng = np.random.default_rng(7)
        for _ in range(10):
            big_rows = rng.integers(0, pf.n, 512)
            big = {
                "img": np.zeros((512, 32, 32, 3), np.uint8),
                "gaze": np.zeros((512, 2), np.float32),
                "pose": np.zeros((512, 2), np.float32),
            }
            t_big = pool.gather_async(
                np.zeros(512, np.int32), big_rows,
                big["img"], big["gaze"], big["pose"],
            )
            smalls = []
            for _ in range(8):
                rows = rng.integers(0, pf.n, 2)
                bufs = (
                    np.zeros((2, 32, 32, 3), np.uint8),
                    np.zeros((2, 2), np.float32),
                    np.zeros((2, 2), np.float32),
                )
                smalls.append(
                    (pool.gather_async(np.zeros(2, np.int32), rows, *bufs),
                     rows, bufs)
                )
            pool.wait(t_big)
            np.testing.assert_array_equal(big["img"], pf.images[big_rows])
            np.testing.assert_array_equal(big["gaze"], pf.gaze[big_rows])
            for t, rows, bufs in smalls:
                pool.wait(t)
                np.testing.assert_array_equal(bufs[0], pf.images[rows])

    def test_mixed_resolution_pool_rejected(self, tmp_path):
        paths = []
        for i, size in enumerate((16, 32)):
            src = str(tmp_path / f"s{i}.h5")
            write_synthetic_h5(src, n_frames=1, image_size=size)
            paths.append(pack_hdf5(src, src + ".pack", "xgaze", "rgb"))
        # rejected at the C++ AddFile layer now (error -4, mixed geometry
        # would corrupt the gather output layout); the Python shape check
        # remains as a second line of defense
        with pytest.raises((IOError, ValueError), match="geometry|image shape"):
            NativePool(paths)

    def test_multi_file_gather(self, tmp_path):
        paths = []
        for i in range(3):
            src = str(tmp_path / f"s{i}.h5")
            write_synthetic_h5(src, n_frames=1, image_size=16, seed=i)
            paths.append(pack_hdf5(src, src + ".pack", "xgaze", "rgb"))
        pool = NativePool(paths)
        pfs = [PackedFile(p) for p in paths]
        files = np.array([0, 1, 2, 2, 0], np.int32)
        rows = np.array([0, 5, 17, 3, 11], np.int64)
        out = pool.gather(files, rows)
        for s, (fi, r) in enumerate(zip(files, rows)):
            np.testing.assert_array_equal(out["img"][s], pfs[fi].images[r])


@needs_native
class TestNativeBatchLoader:
    @pytest.fixture
    def dataset(self, tmp_path):
        write_synthetic_dataset(str(tmp_path), ["a.h5", "b.h5"], n_frames=2)
        return PackedGazeDataset(
            "xgaze", str(tmp_path), "bgr", ["a.h5", "b.h5"], seed=0
        )

    def test_matches_h5py_loader_contract(self, tmp_path, dataset):
        """Native batches carry the same samples as the h5py GazeDataset."""
        h5_ds = GazeDataset("xgaze", str(tmp_path), "bgr", ["a.h5", "b.h5"], seed=0)
        assert dataset.idx_to_kv == h5_ds.idx_to_kv
        loader = NativeBatchLoader(dataset, batch_size=16)
        batches = list(loader)
        assert sum(b["img_0"].shape[0] for b in batches) == len(dataset)
        b0 = batches[0]
        s0 = h5_ds[0]
        np.testing.assert_array_equal(b0["img_0"][0], s0["img_0"])
        np.testing.assert_allclose(b0["gt_gaze"][0], s0["gt_gaze"], atol=1e-6)
        np.testing.assert_allclose(
            b0["head_pose_1"][0], s0["head_pose_1"], atol=1e-6
        )

    def test_shuffle_and_epochs(self, dataset):
        loader = NativeBatchLoader(dataset, batch_size=8, shuffle=True, seed=1)
        e0 = np.concatenate([b["idx_0"] for b in loader])
        order0 = loader.last_epoch_order
        e1 = np.concatenate([b["idx_0"] for b in loader])
        assert sorted(e0.tolist()) == sorted(e1.tolist())
        assert not np.array_equal(e0, e1)
        # last_epoch_order records the order each iteration actually
        # yielded (same contract as BatchLoader — the trainer's per-subject
        # breakdown replays rows from it)
        np.testing.assert_array_equal(
            e0, [dataset.idx_to_kv[int(r)][1] for r in order0]
        )
        np.testing.assert_array_equal(
            e1, [dataset.idx_to_kv[int(r)][1] for r in loader.last_epoch_order]
        )
        assert not np.array_equal(order0, loader.last_epoch_order)

    def test_drop_last(self, dataset):
        loader = NativeBatchLoader(dataset, batch_size=7, drop_last=True)
        assert all(b["img_0"].shape[0] == 7 for b in loader)

    def test_skip_batches_fast_forwards_one_epoch(self, dataset):
        """Same step-exact-resume contract as BatchLoader: skip_batches
        starts the next iteration at batch k of the same permutation,
        one-shot."""
        full = NativeBatchLoader(dataset, batch_size=8, shuffle=True, seed=1)
        ref = [b["idx_0"] for b in full]

        loader = NativeBatchLoader(dataset, batch_size=8, shuffle=True, seed=1)
        loader.skip_batches = 2
        got = [b["idx_0"] for b in loader]
        assert len(got) == len(ref) - 2
        for a, b in zip(got, ref[2:]):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(
            np.concatenate(got),
            [dataset.idx_to_kv[int(r)][1] for r in loader.last_epoch_order],
        )
        assert loader.skip_batches == 0
        assert len(list(loader)) == len(loader)


@needs_native
class TestTrainerWithNativeLoader:
    def test_trainer_epoch_on_native_loader(self, tmp_path):
        from types import SimpleNamespace

        import numpy as _np

        from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
        from rot_mvgaze_tpu.models import FeatRotationSymm
        from rot_mvgaze_tpu.train import Trainer

        write_synthetic_dataset(str(tmp_path), ["a.h5"], n_frames=2)
        ds = PackedGazeDataset("xgaze", str(tmp_path), "bgr", ["a.h5"], seed=0)
        cfg = SimpleNamespace(
            mode="train", exp_name="native", output_dir=str(tmp_path / "logs"),
            ckpt_resume=None, print_freq=100, seed=0, batch_size=12,
            test_batch_size=12, epochs=1, save_epoch=10, image_size=32,
            scheduler_step="iteration",
        )
        trainer = Trainer(
            cfg,
            FeatRotationSymm(backbone_depth=18, num_iter=1),
            IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5),
            NativeBatchLoader(ds, 12, shuffle=True, drop_last=True),
            NativeBatchLoader(ds, 12),
        )
        trainer.train_one_epoch(0)
        err = trainer.test(0)
        assert _np.isfinite(err)


class TestCorruptionSafety:
    """Truncated/corrupt packed caches must fail loudly or repack — never
    SIGBUS inside a worker memcpy (review r2b)."""

    def _make_pack(self, tmp_path, name="s"):
        src = str(tmp_path / f"{name}.h5")
        write_synthetic_h5(src, n_frames=2, image_size=16)
        return src, pack_hdf5(src, str(tmp_path / f"{name}.pack"), "xgaze", "bgr")

    def test_is_valid_pack_detects_truncation(self, tmp_path):
        import os

        from rot_mvgaze_tpu.data.packed import expected_size, is_valid_pack

        _, dst = self._make_pack(tmp_path)
        assert is_valid_pack(dst)
        assert os.path.getsize(dst) == expected_size(dst)
        # truncate mid-image-stream: header intact, data missing
        with open(dst, "r+b") as f:
            f.truncate(os.path.getsize(dst) // 2)
        assert not is_valid_pack(dst)

    def test_pack_dataset_repacks_truncated_cache(self, tmp_path):
        import os

        from rot_mvgaze_tpu.data.packed import is_valid_pack, pack_dataset

        src, _ = self._make_pack(tmp_path)
        cache = str(tmp_path / "cache")
        (p,) = pack_dataset(str(tmp_path), ["s.h5"], cache, "xgaze", "bgr")
        with open(p, "r+b") as f:
            f.truncate(os.path.getsize(p) // 2)
        # mtime is fresh, but the file is invalid -> must repack
        os.utime(p, None)
        (p2,) = pack_dataset(str(tmp_path), ["s.h5"], cache, "xgaze", "bgr")
        assert p2 == p and is_valid_pack(p2)

    @needs_native
    def test_native_pool_rejects_truncated_file(self, tmp_path):
        import os

        _, dst = self._make_pack(tmp_path)
        with open(dst, "r+b") as f:
            f.truncate(os.path.getsize(dst) // 2)
        with pytest.raises(IOError):
            NativePool([dst])

    @needs_native
    def test_native_pool_rejects_short_header(self, tmp_path):
        bad = str(tmp_path / "bad.pack")
        with open(bad, "wb") as f:
            f.write(b"RMGPACK1XX")  # magic but no header
        with pytest.raises(IOError):
            NativePool([bad])


@needs_native
class TestPairIndexValidation:
    """r4 review batch 4: bad pair indices must fail in Python, never reach
    the C++ gather's memcpy (SIGBUS with no traceback)."""

    def test_empty_pair_index_raises_cleanly(self, tmp_path):
        # np.asarray([]) is 1-D; kv[:, 0] used to raise a bare IndexError
        write_synthetic_dataset(str(tmp_path), ["a.h5"], n_frames=2)
        ds = PackedGazeDataset(
            "xgaze", str(tmp_path), "bgr", ["a.h5"], seed=0, pair_index=[]
        )
        with pytest.raises(ValueError, match="empty"):
            NativeBatchLoader(ds, batch_size=4)

    def test_out_of_range_pair_index_rejected(self, tmp_path):
        # a stale pack (source replaced without advancing its mtime) leaves
        # the pack shorter than the h5-derived pair index expects
        write_synthetic_dataset(str(tmp_path), ["a.h5"], n_frames=2)
        with pytest.raises(ValueError, match="stale"):
            PackedGazeDataset(
                "xgaze", str(tmp_path), "bgr", ["a.h5"], seed=0,
                pair_index=[(0, 10_000, 0)],
            )

    def test_out_of_range_file_key_rejected(self, tmp_path):
        write_synthetic_dataset(str(tmp_path), ["a.h5"], n_frames=2)
        with pytest.raises(ValueError, match="packed files"):
            PackedGazeDataset(
                "xgaze", str(tmp_path), "bgr", ["a.h5"], seed=0,
                pair_index=[(3, 0, 0)],
            )
