"""ctypes bindings + loader over the native batch-assembly engine.

Builds ``native/loader.cpp`` on first use (g++, cached .so), exposes:

- :class:`NativePool` — thin wrapper over the C ABI.
- :class:`PackedGazeDataset` — GazeDataset-compatible dataset over packed
  caches with the same stereo pair index.
- :class:`NativeBatchLoader` — batch iterator emitting the standard batch
  dict, assembled by parallel memcpy in C++ with async double-buffering;
  drop-in replacement for rot_mvgaze_tpu.data.BatchLoader on the hot path.

Falls back to pure-numpy gathers when a C++ toolchain is unavailable
(``NativePool.available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from rot_mvgaze_tpu.data.packed import PackedFile, pack_dataset
from rot_mvgaze_tpu.data.pairing import resolve_pair_index

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "loader.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "librmg_loader.so")

_lib = None
_lib_failed = False  # memoize a failed build: no toolchain won't appear mid-process
_lib_lock = threading.Lock()


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                # compile to a private temp path, then atomically publish:
                # concurrent builders can't corrupt each other's .so, and an
                # interrupted compile never leaves a half-written library
                # whose fresh mtime would suppress the rebuild forever
                tmp_so = f"{_SO}.tmp.{os.getpid()}"
                try:
                    subprocess.run(
                        [
                            "g++", "-O3", "-march=native", "-std=c++17",
                            "-shared", "-fPIC", "-o", tmp_so, _SRC,
                            "-lpthread",
                        ],
                        check=True,
                        capture_output=True,
                    )
                    os.replace(tmp_so, _SO)
                finally:
                    if os.path.exists(tmp_so):
                        os.unlink(tmp_so)
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError):
            # cache the failure: every later available() / NativePool call
            # would otherwise re-run the g++ subprocess just to fail again
            _lib_failed = True
            return None
        lib.rmg_pool_create.restype = ctypes.c_void_p
        lib.rmg_pool_create.argtypes = [ctypes.c_int]
        lib.rmg_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.rmg_pool_add.restype = ctypes.c_int
        lib.rmg_pool_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.rmg_file_info.restype = ctypes.c_int
        lib.rmg_file_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.rmg_pool_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.rmg_pool_gather_async.restype = ctypes.c_uint64
        lib.rmg_pool_gather_async.argtypes = lib.rmg_pool_gather.argtypes
        lib.rmg_wait.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        _lib = lib
        return _lib


class NativePool:
    """RAII wrapper over the C++ mmap/gather pool."""

    def __init__(self, paths: Sequence[str], n_threads: int = 0) -> None:
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self._lib = lib
        self._pool = ctypes.c_void_p(lib.rmg_pool_create(n_threads))
        self.shapes: List[tuple] = []
        for p in paths:
            idx = lib.rmg_pool_add(self._pool, p.encode())
            if idx < 0:
                reasons = {
                    -1: "cannot open/map",
                    -2: "bad magic or truncated header",
                    -3: "inconsistent extents (corrupt pack)",
                    -4: "image dims differ from the pool's first file "
                        "(all packs in one pool must share one geometry)",
                }
                raise IOError(
                    f"rmg_pool_add failed for {p}: "
                    f"{reasons.get(idx, f'error {idx}')}"
                )
            n = ctypes.c_int64()
            h = ctypes.c_int()
            w = ctypes.c_int()
            c = ctypes.c_int()
            lib.rmg_file_info(self._pool, idx, n, h, w, c)
            self.shapes.append((n.value, h.value, w.value, c.value))
        # Geometry uniformity (all packs share one H, W, C) is enforced by
        # AddFile itself: any mismatch with the pool's first file returns -4
        # above, so shapes[0]'s per-sample stride is valid for every file.

    @staticmethod
    def available() -> bool:
        return _load_library() is not None

    def gather(
        self, files: np.ndarray, rows: np.ndarray
    ) -> Dict[str, np.ndarray]:
        n = len(rows)
        _, h, w, c = self.shapes[0]
        imgs = np.empty((n, h, w, c), np.uint8)
        gaze = np.empty((n, 2), np.float32)
        pose = np.empty((n, 2), np.float32)
        files = np.ascontiguousarray(files, np.int32)
        rows = np.ascontiguousarray(rows, np.int64)
        self._lib.rmg_pool_gather(
            self._pool,
            files.ctypes.data_as(ctypes.c_void_p),
            rows.ctypes.data_as(ctypes.c_void_p),
            n,
            imgs.ctypes.data_as(ctypes.c_void_p),
            gaze.ctypes.data_as(ctypes.c_void_p),
            pose.ctypes.data_as(ctypes.c_void_p),
        )
        return {"img": imgs, "gaze": gaze, "head_pose": pose}

    def gather_async(self, files, rows, imgs, gaze, pose) -> int:
        files = np.ascontiguousarray(files, np.int32)
        rows = np.ascontiguousarray(rows, np.int64)
        ticket = self._lib.rmg_pool_gather_async(
            self._pool,
            files.ctypes.data_as(ctypes.c_void_p),
            rows.ctypes.data_as(ctypes.c_void_p),
            len(rows),
            imgs.ctypes.data_as(ctypes.c_void_p),
            gaze.ctypes.data_as(ctypes.c_void_p),
            pose.ctypes.data_as(ctypes.c_void_p),
        )
        # keep index arrays (and output buffers) alive while in flight
        if not hasattr(self, "_inflight"):
            self._inflight = {}
        self._inflight[ticket] = (files, rows, imgs, gaze, pose)
        return ticket

    def wait(self, ticket: int) -> None:
        self._lib.rmg_wait(self._pool, ticket)
        if hasattr(self, "_inflight"):
            self._inflight.pop(ticket, None)

    def __del__(self) -> None:
        if getattr(self, "_pool", None):
            self._lib.rmg_pool_destroy(self._pool)
            self._pool = None


class PackedGazeDataset:
    """GazeDataset-compatible dataset over packed caches.

    Packs the HDF5 archives on first use (cache_dir defaults to a sibling
    ``_rmgpack`` directory), builds the identical stereo pair index
    (/root/reference/dataset/gaze.py:60-73), and serves samples via the
    native pool (or numpy mmap fallback).
    """

    def __init__(
        self,
        dataset_name: str,
        dataset_path: str,
        color_type: str,
        keys_to_use: Sequence[str],
        camera_tag: str = "all",
        stereo: bool = True,
        seed: int = 0,
        cache_dir: Optional[str] = None,
        use_native: bool = True,
        pairing: str = "reference",
        pair_rng=None,
        pair_index=None,
    ) -> None:
        cache_dir = cache_dir or os.path.join(
            dataset_path, "_rmgpack", dataset_name
        )
        self.paths = pack_dataset(
            dataset_path, list(keys_to_use), cache_dir, dataset_name, color_type
        )
        self.stereo = stereo
        self._np_files = [PackedFile(p) for p in self.paths]
        sizes = [f.n for f in self._np_files]
        # Same pairing contract as GazeDataset (shared dispatch in
        # data/pairing.py); the CLI passes pair_index from the h5 datasets
        # so native and h5 paths are guaranteed index-identical.
        self.idx_to_kv = resolve_pair_index(
            sizes, camera_tag, pairing=pairing, pair_rng=pair_rng,
            seed=seed, pair_index=pair_index,
        )
        # Bounds-check the pair index against the packs' ACTUAL row counts.
        # An externally supplied pair_index (the CLI passes the one built
        # from the live h5 sizes) combined with a stale pack (source file
        # replaced without advancing its mtime — cp -p / rsync -a / same-
        # second rewrite defeats pack_dataset's mtime freshness check) would
        # otherwise drive the C++ gather's memcpy past the mmap'd extent:
        # a SIGBUS that kills the process with no Python traceback.
        kv = np.asarray(self.idx_to_kv, np.int64).reshape(-1, 3)
        if kv.size:
            if kv[:, 0].min() < 0 or kv[:, 0].max() >= len(sizes):
                raise ValueError(
                    f"pair index references file {int(kv[:, 0].max())} but "
                    f"only {len(sizes)} packed files exist"
                )
            limits = np.asarray(sizes, np.int64)[kv[:, 0]]
            bad = (
                (kv[:, 1] < 0) | (kv[:, 1] >= limits)
                | (kv[:, 2] < 0) | (kv[:, 2] >= limits)
            )
            if bad.any():
                i = int(np.argmax(bad))
                key = keys_to_use[int(kv[i, 0])]
                raise ValueError(
                    f"pair index row {i} references sample "
                    f"{int(max(kv[i, 1], kv[i, 2]))} of '{key}' but its pack "
                    f"holds only {int(limits[i])} rows — the pack is stale "
                    f"(source archive changed without advancing its mtime). "
                    f"Delete '{cache_dir}' to re-pack."
                )
        self.pool: Optional[NativePool] = None
        if use_native and NativePool.available():
            self.pool = NativePool(self.paths)

    def __len__(self) -> int:
        return len(self.idx_to_kv)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        key, idx, idx_b = self.idx_to_kv[index]
        f = self._np_files[key]
        data = {
            "img_0": np.asarray(f.images[idx]),
            "gt_gaze": np.asarray(f.gaze[idx], np.float64),
            "head_pose_0": np.asarray(f.head_pose[idx], np.float64),
            "idx_0": idx,
        }
        if self.stereo:
            data.update(
                {
                    "img_1": np.asarray(f.images[idx_b]),
                    "gt_gaze_1": np.asarray(f.gaze[idx_b], np.float64),
                    "head_pose_1": np.asarray(f.head_pose[idx_b], np.float64),
                    "idx_1": idx_b,
                }
            )
        return data


class NativeBatchLoader:
    """Shuffling batch iterator assembled by the C++ pool with async
    double-buffering. Emits the standard batch dict contract."""

    def __init__(
        self,
        dataset: PackedGazeDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        process_shard: Optional[tuple] = None,
    ) -> None:
        assert dataset.pool is not None, "native pool unavailable"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # (index, count): this host's equal-size disjoint shard of the seeded
        # global order (multi-host DP) — same contract as BatchLoader.
        self.process_shard = process_shard
        self.epoch = 0
        # one-shot mid-epoch fast-forward — same contract as BatchLoader
        self.skip_batches = 0
        # flat (file, row, row_b) arrays for vectorized batch index math
        if len(dataset.idx_to_kv) == 0:
            # np.asarray([]) is 1-D; kv[:, 0] would raise a bare IndexError
            raise ValueError(
                "dataset pair index is empty (no frame has >= 2 cameras in "
                "this split) — nothing to load"
            )
        kv = np.asarray(dataset.idx_to_kv, np.int64)
        self._files = kv[:, 0].astype(np.int32)
        self._rows = kv[:, 1]
        self._rows_b = kv[:, 2]

    def num_samples(self) -> int:
        from rot_mvgaze_tpu.data.pipeline import sharded_num_samples

        return sharded_num_samples(len(self.dataset), self.process_shard)

    def __len__(self) -> int:
        n = self.num_samples()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        from rot_mvgaze_tpu.data.pipeline import epoch_order

        return epoch_order(
            len(self.dataset), self.shuffle, self.seed, self.epoch,
            self.process_shard,
        )

    def __iter__(self):
        pool = self.dataset.pool
        order = self._epoch_order()
        skip = int(self.skip_batches)
        self.skip_batches = 0  # one-shot: a resumed epoch applies it once
        first = skip * self.batch_size
        # same contract as BatchLoader: the order THIS iteration yields
        # (epoch advances in the finally, so post-hoc recomputation from
        # attributes would replay the NEXT epoch's permutation)
        self.last_epoch_order = order[first:]
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        starts = list(range(first, stop, self.batch_size))
        _, h, w, c = pool.shapes[0]

        # two in-flight buffers (double buffering via async gather)
        def alloc(bs):
            return {
                "img_0": np.empty((bs, h, w, c), np.uint8),
                "gt_gaze": np.empty((bs, 2), np.float32),
                "head_pose_0": np.empty((bs, 2), np.float32),
                "img_1": np.empty((bs, h, w, c), np.uint8),
                "gt_gaze_1": np.empty((bs, 2), np.float32),
                "head_pose_1": np.empty((bs, 2), np.float32),
            }

        def submit(start):
            idxs = order[start : start + self.batch_size]
            bs = len(idxs)
            buf = alloc(bs)
            t0 = pool.gather_async(
                self._files[idxs], self._rows[idxs],
                buf["img_0"], buf["gt_gaze"], buf["head_pose_0"],
            )
            t1 = pool.gather_async(
                self._files[idxs], self._rows_b[idxs],
                buf["img_1"], buf["gt_gaze_1"], buf["head_pose_1"],
            )
            buf["idx_0"] = self._rows[idxs].astype(np.int32)
            buf["idx_1"] = self._rows_b[idxs].astype(np.int32)
            return (t0, t1, buf)

        inflight = []
        try:
            for start in starts[:2]:
                inflight.append(submit(start))
            next_i = 2
            while inflight:
                t0, t1, buf = inflight.pop(0)
                pool.wait(t0)
                pool.wait(t1)
                if next_i < len(starts):
                    inflight.append(submit(starts[next_i]))
                    next_i += 1
                yield buf
        finally:
            # Early consumer exit (preemption, break): drain in-flight
            # gathers so their pinned buffers are released, and advance the
            # epoch so a resumed run reshuffles — the BatchLoader contract.
            for t0, t1, _buf in inflight:
                pool.wait(t0)
                pool.wait(t1)
            self.epoch += 1
