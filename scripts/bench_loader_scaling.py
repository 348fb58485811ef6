#!/usr/bin/env python
"""Host-loader ceiling: native gather throughput vs thread count.

The DP scaling claim needs a grounded INPUT-side number: 8 v5e chips at
~2,434 imgs/s/chip consume ~19.5k imgs/s = ~9.7k stereo samples/s, and the
host must assemble that from the packed caches. This script measures the
native C++ gather engine (native/loader.cpp) end-to-end through
NativeBatchLoader — shuffled stereo batches, double-buffered async gathers,
full Python iteration overhead — as a function of pool thread count, and
prints per-thread efficiency so the required core count on a real TPU-host
(v5e-8 hosts have dozens of vCPUs; this dev host has
``os.cpu_count()`` = printed below) can be extrapolated.

Data lives in tmpfs (/dev/shm) by default so the measurement is the
memcpy/assembly engine, not cold-disk IO — matching the page-cache-hot
steady state of a training epoch.

Usage: python scripts/bench_loader_scaling.py [--threads 1,2,4,8]
       [--samples 8192] [--image-size 224] [--batch 128] [--out PATH]
Writes a JSON record per sweep point and a markdown table for docs/PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rot_mvgaze_tpu.data.packed import write_pack  # noqa: E402


def write_synth_pack(path: str, n: int, size: int, seed: int) -> None:
    """Synthetic cache via the CANONICAL RMGPACK1 writer (one layout owner,
    rot_mvgaze_tpu/data/packed.py); blocks streamed so RSS stays bounded."""
    rng = np.random.default_rng(seed)
    h = w = size
    c = 3

    def blocks():
        for start in range(0, n, 1024):
            m = min(1024, n - start)
            yield rng.integers(0, 256, (m, h, w, c), dtype=np.uint8)

    write_pack(
        path, n, h, w, c, blocks(),
        rng.uniform(-1, 1, (n, 2)).astype(np.float32),
        rng.uniform(-1, 1, (n, 2)).astype(np.float32),
    )


def run_point(paths, n_threads, batch, n_iter_samples):
    from rot_mvgaze_tpu.data.native import NativeBatchLoader, NativePool

    # PackedGazeDataset insists on real pair indices; for a pure throughput
    # sweep, pair every row with a random same-file partner.
    class _DS:
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

    pool = NativePool(paths, n_threads=n_threads)
    ds = _DS(pool)
    loader = NativeBatchLoader(ds, batch_size=batch, shuffle=True, seed=0)

    # warm epoch fragment (page-in + thread-pool spin-up)
    it = iter(loader)
    for _ in range(4):
        next(it)

    done = 0
    t0 = time.perf_counter()
    for b in it:
        done += len(b["idx_0"])
        if done >= n_iter_samples:
            break
    dt = time.perf_counter() - t0
    rate = done / dt
    del loader, ds, pool
    return rate, done, dt


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--threads", default="1,2,4,8")
    p.add_argument("--samples", type=int, default=8192,
                   help="synthetic samples per file (x4 files)")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iter-samples", type=int, default=16384,
                   help="stereo samples to time per sweep point")
    p.add_argument("--dir", default="/dev/shm",
                   help="where the synthetic packs live (tmpfs default)")
    p.add_argument("--out", default=None, help="write JSON results here")
    args = p.parse_args()

    from rot_mvgaze_tpu.data.native import NativePool

    if not NativePool.available():
        print("native loader unavailable (no g++?)", file=sys.stderr)
        return 2

    bytes_per_stereo = 2 * args.image_size * args.image_size * 3
    with tempfile.TemporaryDirectory(dir=args.dir) as td:
        paths = []
        for i in range(4):
            path = os.path.join(td, f"pack{i}.rmg")
            write_synth_pack(path, args.samples, args.image_size, seed=i)
            paths.append(path)
        total_gb = 4 * args.samples * bytes_per_stereo / 2 / 1e9
        print(f"# host cpus={os.cpu_count()} packs=4x{args.samples} "
              f"({total_gb:.1f} GB in {args.dir}) image={args.image_size}^2 "
              f"batch={args.batch}", flush=True)

        results = []
        for t in [int(x) for x in args.threads.split(",")]:
            rate, done, dt = run_point(paths, t, args.batch, args.iter_samples)
            rec = {
                "n_threads": t,
                "stereo_samples_per_sec": round(rate, 1),
                "images_per_sec": round(2 * rate, 1),
                "gbytes_per_sec": round(rate * bytes_per_stereo / 1e9, 2),
                "per_thread_rate": round(rate / max(t, 1), 1),
                "timed_samples": done,
                "wall_s": round(dt, 2),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

        print("\n| threads | stereo samples/s | imgs/s | GB/s | per-thread |")
        print("|---|---|---|---|---|")
        for r in results:
            print(f"| {r['n_threads']} | {r['stereo_samples_per_sec']:,} | "
                  f"{r['images_per_sec']:,} | {r['gbytes_per_sec']} | "
                  f"{r['per_thread_rate']:,} |")
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"cpus": os.cpu_count(), "results": results}, f,
                          indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
