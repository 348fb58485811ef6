"""Packed sample cache: the on-disk format for the native (C++) loader.

HDF5 random reads through h5py serialize on a global lock and decompress
per-access — the reference hides this behind 8 worker processes
(/root/reference/main.py:226). For TPU-rate input we instead pack each
subject archive ONCE into a flat, uncompressed, mmap-able cache; batch
assembly then becomes pure parallel memcpy (rot_mvgaze_tpu/data/native.py +
native/loader.cpp), with zero per-sample Python or HDF5 involvement.

Layout (little-endian, SoA):

    offset 0   : magic  b"RMGPACK1"
    offset 8   : u64 n_samples
    offset 16  : u32 height, u32 width, u32 channels, u32 flags
    offset 32  : u64 img_off, u64 gaze_off, u64 pose_off   (absolute)
    img  : n * H * W * C  uint8   (RGB order — color conversion applied here)
    gaze : n * 2          float32
    pose : n * 2          float32 (mpiinv pitch sign flip applied here)

All per-sample transforms that the reference does at read time
(/root/reference/dataset/gaze.py:106-124) are baked in at pack time, so the
hot path is transform-free.
"""

from __future__ import annotations

import os
import struct
from typing import Tuple

import numpy as np

MAGIC = b"RMGPACK1"
HEADER_SIZE = 56


def write_pack(out_path, n, h, w, c, image_blocks, gaze, pose) -> str:
    """THE canonical RMGPACK1 writer — every pack on disk comes from here
    (pack_hdf5 and the synthetic benchmark corpora), so the layout has one
    owner. ``image_blocks`` is an iterable of uint8 (m, h, w, c) blocks
    totalling n samples (streamed so peak RSS stays bounded); ``gaze`` and
    ``pose`` are (n, 2) float32.

    Atomic publish: stream into a temp file, fsync, then rename. A
    crash/preemption mid-pack must never leave a truncated file at the
    final path — its mtime would pass the freshness check and the mmap
    consumers would read past EOF (SIGBUS in the C++ gather). uuid, not
    pid: on a SHARED cache dir, multi-host jobs pack concurrently and
    containerized hosts commonly share namespaced PIDs — two writers on
    one tmp file would break the atomicity."""
    import uuid

    gaze = np.ascontiguousarray(gaze, dtype=np.float32)
    pose = np.ascontiguousarray(pose, dtype=np.float32)
    assert gaze.shape == (n, 2) and pose.shape == (n, 2), (gaze.shape, pose.shape)
    img_off = HEADER_SIZE
    gaze_off = img_off + n * h * w * c
    pose_off = gaze_off + gaze.nbytes
    tmp_path = f"{out_path}.tmp.{uuid.uuid4().hex}"
    try:
        with open(tmp_path, "wb") as out:
            out.write(MAGIC)
            out.write(struct.pack("<Q", n))
            out.write(struct.pack("<IIII", h, w, c, 0))
            out.write(struct.pack("<QQQ", img_off, gaze_off, pose_off))
            assert out.tell() == HEADER_SIZE
            written = 0
            for block in image_blocks:
                block = np.ascontiguousarray(block, dtype=np.uint8)
                assert block.shape[1:] == (h, w, c), block.shape
                written += block.shape[0]
                out.write(block.tobytes())
            assert written == n, f"image blocks totalled {written} != {n}"
            out.write(gaze.tobytes())
            out.write(pose.tobytes())
            out.flush()
            os.fsync(out.fileno())
        os.replace(tmp_path, out_path)
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
    return out_path


def pack_hdf5(
    h5_path: str,
    out_path: str,
    dataset_name: str = "xgaze",
    color_type: str = "bgr",
    chunk: int = 512,
) -> str:
    """Convert one subject HDF5 archive into a packed cache file."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        n, h, w, c = f["face_patch"].shape
        gaze = np.asarray(f["face_gaze"], dtype=np.float32)
        pose = np.asarray(f["face_head_pose"], dtype=np.float32)
        if dataset_name == "mpiinv":
            pose[:, 0] *= -1  # pitch sign convention

        def blocks():
            for start in range(0, n, chunk):
                block = np.asarray(f["face_patch"][start : start + chunk])
                if color_type == "bgr":
                    block = block[..., ::-1]
                yield block

        write_pack(out_path, n, h, w, c, blocks(), gaze, pose)
    return out_path


def expected_size(path: str) -> int:
    """Total byte size a packed file's header claims (for integrity checks)."""
    n, h, w, c, _img_off, _gaze_off, pose_off = read_header(path)
    return pose_off + n * 8


def is_valid_pack(path: str) -> bool:
    """True iff ``path`` is a complete packed cache (magic + full extent)."""
    try:
        if os.path.getsize(path) < HEADER_SIZE:
            return False
        return os.path.getsize(path) >= expected_size(path)
    except (OSError, AssertionError):
        return False


def read_header(path: str) -> Tuple[int, int, int, int, int, int, int]:
    """Returns (n, h, w, c, img_off, gaze_off, pose_off)."""
    with open(path, "rb") as f:
        head = f.read(HEADER_SIZE)
    assert head[:8] == MAGIC, f"{path}: bad magic"
    n = struct.unpack_from("<Q", head, 8)[0]
    h, w, c, _flags = struct.unpack_from("<IIII", head, 16)
    img_off, gaze_off, pose_off = struct.unpack_from("<QQQ", head, 32)
    return n, h, w, c, img_off, gaze_off, pose_off


class PackedFile:
    """Pure-numpy mmap view of one packed cache file (fallback / testing;
    the fast path is the C++ pool in rot_mvgaze_tpu.data.native)."""

    def __init__(self, path: str) -> None:
        self.path = path
        (self.n, self.h, self.w, self.c, img_off, gaze_off, pose_off) = (
            read_header(path)
        )
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        self.images = self._mm[img_off : img_off + self.n * self.h * self.w * self.c]
        self.images = self.images.reshape(self.n, self.h, self.w, self.c)
        self.gaze = (
            self._mm[gaze_off : gaze_off + self.n * 8]
            .view(np.float32)
            .reshape(self.n, 2)
        )
        self.head_pose = (
            self._mm[pose_off : pose_off + self.n * 8]
            .view(np.float32)
            .reshape(self.n, 2)
        )


def pack_dataset(
    dataset_path: str,
    subjects: list,
    cache_dir: str,
    dataset_name: str,
    color_type: str,
) -> list:
    """Pack every subject archive that isn't cached yet; returns cache paths."""
    os.makedirs(cache_dir, exist_ok=True)
    out = []
    for name in subjects:
        src = os.path.join(dataset_path, name)
        dst = os.path.join(cache_dir, name + ".rmgpack")
        if (
            not os.path.exists(dst)
            or os.path.getmtime(dst) < os.path.getmtime(src)
            or not is_valid_pack(dst)  # truncated/corrupt cache -> repack
        ):
            pack_hdf5(src, dst, dataset_name=dataset_name, color_type=color_type)
        out.append(dst)
    return out


def _main() -> int:
    """CLI: pre-pack subject HDF5 archives for the native loader.

    Usage: python -m rot_mvgaze_tpu.data.packed DATASET_DIR \
               --dataset {xgaze,mpiinv} [--color {bgr,rgb}] [--cache_dir DIR]
    """
    import argparse
    import glob
    import sys
    import time

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("dataset_dir")
    p.add_argument("--dataset", choices=["xgaze", "mpiinv"], default="xgaze")
    p.add_argument("--color", choices=["bgr", "rgb"], default=None)
    p.add_argument("--cache_dir", default=None)
    args = p.parse_args()

    color = args.color or ("bgr" if args.dataset == "xgaze" else "rgb")
    subjects = sorted(
        os.path.basename(f)
        for f in glob.glob(os.path.join(args.dataset_dir, "*.h5"))
    )
    if not subjects:
        print(f"no .h5 archives under {args.dataset_dir}", file=sys.stderr)
        return 1
    cache_dir = args.cache_dir or os.path.join(
        args.dataset_dir, "_rmgpack", args.dataset
    )
    t0 = time.perf_counter()
    paths = pack_dataset(args.dataset_dir, subjects, cache_dir, args.dataset, color)
    print(
        f"packed {len(paths)} archives -> {cache_dir} "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
