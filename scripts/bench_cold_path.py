#!/usr/bin/env python
"""Cold data path: h5->pack conversion cost + page-cache-cold epoch rate.

BASELINE.md/PERF.md's loader-scaling table (r4) measures the page-cache-HOT
steady state; VERDICT r4 item #6 asks for the two missing cold numbers:

1. **Conversion throughput** — `pack_hdf5` (data/packed.py), the one-time
   h5 -> RMGPACK1 cost every subject archive pays before the native loader
   can serve it (the reference has no such step: its h5py workers re-decode
   HDF5 chunks every epoch, /root/reference/main.py:226).
2. **Cold first-epoch rate** — NativeBatchLoader over packs that are NOT
   in the page cache (`sync; echo 3 > /proc/sys/vm/drop_caches`, needs
   root; skipped with a note otherwise), vs the hot second epoch over the
   same packs. This bounds the disk-bound first epoch of a training run.

Usage: python scripts/bench_cold_path.py [--samples 4096] [--files 2]
       [--image-size 224] [--dir /tmp] [--out PATH]
Prints one JSON line; --dir must be on real disk (ext4), not tmpfs.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rot_mvgaze_tpu.data.packed import pack_hdf5  # noqa: E402
from rot_mvgaze_tpu.data.synthetic import write_synthetic_h5  # noqa: E402


def fs_type(path: str) -> str:
    """Filesystem type of the mount holding ``path`` (longest-prefix match
    over /proc/mounts; '' if unreadable)."""
    path = os.path.realpath(path)
    best, best_type = "", ""
    try:
        with open("/proc/mounts") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    mnt = parts[1]
                    if path.startswith(mnt.rstrip("/") + "/") or path == mnt:
                        if len(mnt) > len(best):
                            best, best_type = mnt, parts[2]
    except OSError:
        pass
    return best_type


def drop_caches() -> bool:
    try:
        subprocess.run(["sync"], check=True)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def epoch_rate(paths, batch: int) -> tuple:
    """One full pass over every row of every pack; stereo samples/s."""
    from rot_mvgaze_tpu.data.native import NativeBatchLoader, NativePool

    class _DS:  # random same-file partners (throughput only)
        def __init__(self, pool):
            self.pool = pool
            rng = np.random.default_rng(0)
            kv = []
            for fi, (n, _h, _w, _c) in enumerate(pool.shapes):
                partners = rng.integers(0, n, n)
                kv.extend((fi, i, int(partners[i])) for i in range(n))
            self.idx_to_kv = kv

        def __len__(self):
            return len(self.idx_to_kv)

    pool = NativePool(paths, n_threads=1)
    ds = _DS(pool)
    loader = NativeBatchLoader(ds, batch_size=batch, shuffle=True, seed=0)
    done = 0
    t0 = time.perf_counter()
    for b in loader:
        done += len(b["idx_0"])
    dt = time.perf_counter() - t0
    del loader, ds, pool
    return done / dt, done, dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=4096,
                    help="rows per synthetic subject archive")
    ap.add_argument("--files", type=int, default=2)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dir", default="/tmp",
                    help="REAL-DISK working dir (not tmpfs)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    fstype = fs_type(args.dir)
    if fstype in ("tmpfs", "ramfs"):
        # drop_caches does NOT evict tmpfs pages (RAM is the backing
        # store), so a "cold" epoch there would silently measure memory
        # bandwidth and be recorded as a cold-DISK number
        print(f"--dir {args.dir} is {fstype}: the cold measurement needs "
              "a real-disk filesystem (pass e.g. --dir /var/tmp)",
              file=sys.stderr)
        return 2
    work = tempfile.mkdtemp(prefix="cold_path_", dir=args.dir)
    S = args.image_size
    bytes_per_row = 2 * (S * S * 3 + 16)  # stereo gather: 2 rows/sample
    record = {
        "samples_per_file": args.samples,
        "files": args.files,
        "image_size": S,
        "cpu_count": os.cpu_count(),
        "fs_type": fstype,
    }
    try:
        # -------- corpus (rows must be a multiple of 18 for the writer)
        frames = -(-args.samples // 18)
        h5s = []
        for i in range(args.files):
            p = os.path.join(work, f"s{i:02d}.h5")
            write_synthetic_h5(p, n_frames=frames, image_size=S, seed=i)
            h5s.append(p)
        n_rows = frames * 18
        record["rows_per_file"] = n_rows

        # -------- 1) conversion throughput (h5 -> pack), cold source
        cold_src = drop_caches()
        t0 = time.perf_counter()
        packs = []
        for p in h5s:
            packs.append(pack_hdf5(p, p + ".rmgpack"))
        # include the fsync-visible cost: conversion is once-per-corpus
        subprocess.run(["sync"], check=True)
        dt = time.perf_counter() - t0
        total_rows = n_rows * args.files
        total_mb = sum(os.path.getsize(p) for p in packs) / 1e6
        record["convert_rows_per_sec"] = round(total_rows / dt, 1)
        record["convert_mb_per_sec"] = round(total_mb / dt, 1)
        record["convert_source_cold"] = cold_src
        record["convert_total_rows"] = total_rows

        # -------- 2) cold vs hot epoch through NativeBatchLoader
        cold_ok = drop_caches()
        record["page_cache_dropped"] = cold_ok
        cold = epoch_rate(packs, args.batch)
        hot = epoch_rate(packs, args.batch)
        record["cold_epoch_samples_per_sec"] = round(cold[0], 1)
        record["hot_epoch_samples_per_sec"] = round(hot[0], 1)
        record["cold_epoch_mb_per_sec"] = round(
            cold[0] * bytes_per_row / 1e6, 1
        )
        record["hot_epoch_mb_per_sec"] = round(
            hot[0] * bytes_per_row / 1e6, 1
        )
        if not cold_ok:
            record["note"] = (
                "drop_caches unavailable (not root): 'cold' epoch ran "
                "against a warm page cache"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(record))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
