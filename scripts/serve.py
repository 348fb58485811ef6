#!/usr/bin/env python
"""Minimal production-style HTTP inference server.

Serves the two-view gaze model over HTTP using the compiled fixed-shape
GazePredictor (rot_mvgaze_tpu.serving): one executable, micro-batched, no
recompiles at request time.

    python scripts/serve.py --ckpt model.msgpack [--port 8347] \
        [--backbone_depth 50 --num_iter 3 --micro_batch 64]

API:
  GET  /healthz            -> {"status": "ok", ...}
  POST /predict            body: npz with img_0, img_1 (N,H,W,3 uint8),
                           head_pose_0, head_pose_1 (N,2 float32)
                           -> npz with pred_gaze (N,2 float32 pitchyaw)

With --num_views V (V > 2) the server runs the V-view model
(rot_mvgaze_tpu.models.multiview) and /predict instead takes npz fields
imgs (N,V,H,W,3 uint8) + head_poses (N,V,2 float32). Stereo checkpoints
load at any V (identical param trees).

Client example:
    buf = io.BytesIO(); np.savez(buf, img_0=..., img_1=..., head_pose_0=...,
                                  head_pose_1=...)
    r = requests.post(url + "/predict", data=buf.getvalue())
    pred = np.load(io.BytesIO(r.content))["pred_gaze"]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# request-body cap PER VIEW PAIR: generous for batch-256 224^2 2-view uint8
# (~80 MB). Scaled by ceil(V/2) at server startup so V-view serving
# (--num_views) admits the same per-view batch sizes as stereo.
MAX_BODY_BYTES = 256 * 1024 * 1024

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_handler(predictor, stats, max_body_bytes=MAX_BODY_BYTES):
    # ThreadingHTTPServer handles requests concurrently: predictor is a
    # BatchingPredictor (thread-safe — concurrent requests coalesce into
    # shared micro-batches on one dispatcher thread); the lock guards the
    # read-modify-write stats updates.
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet default access log
            pass

        def _reply(self, code, payload, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/healthz":
                with lock:
                    snap = dict(stats)
                body = json.dumps(
                    {
                        "status": "ok",
                        "requests": snap["requests"],
                        "samples": snap["samples"],
                        "avg_latency_ms": round(
                            1e3 * snap["time"] / max(snap["requests"], 1), 2
                        ),
                    }
                ).encode()
                self._reply(200, body)
            else:
                self._reply(404, b'{"error": "not found"}')

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, b'{"error": "not found"}')
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                # Cap the body BEFORE reading: the declared length (and a
                # zip-bomb npz, decompressed in full by np.load) would
                # otherwise allocate unboundedly ahead of any validation.
                if length > max_body_bytes:
                    self._reply(
                        413,
                        json.dumps({
                            "error": f"request body {length} bytes exceeds "
                                     f"limit {max_body_bytes}"
                        }).encode(),
                    )
                    return
                data = np.load(io.BytesIO(self.rfile.read(length)))
                t0 = time.perf_counter()
                # field names come from the predictor (stereo:
                # img_0/img_1/head_pose_0/head_pose_1; V-view:
                # imgs/head_poses)
                pred = predictor.predict(
                    *(data[f] for f in predictor.request_fields)
                )
                dt = time.perf_counter() - t0
                with lock:
                    stats["requests"] += 1
                    stats["samples"] += int(pred.shape[0])
                    stats["time"] += dt
                buf = io.BytesIO()
                np.savez(buf, pred_gaze=pred)
                self._reply(200, buf.getvalue(), "application/octet-stream")
            except KeyError as e:
                self._reply(
                    400, json.dumps({"error": f"missing field {e}"}).encode()
                )
            except ValueError as e:
                # shape/dtype validation from BatchingPredictor: the CLIENT
                # is at fault — 400, not 500 (monitoring must not count
                # malformed requests as server errors)
                self._reply(
                    400, json.dumps({"error": f"bad request: {e}"}).encode()
                )
            except Exception as e:  # surface the error to the client
                self._reply(
                    500, json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
                )

    return Handler


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--port", type=int, default=8347)
    p.add_argument("--backbone_depth", type=int, default=50)
    p.add_argument("--num_iter", type=int, default=3)
    p.add_argument("--micro_batch", type=int, default=64)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_views", type=int, default=2,
                   help="serve the V-view model (V > 2): /predict takes "
                        "stacked imgs (N,V,H,W,3) + head_poses (N,V,2). "
                        "Stereo checkpoints load at any V")
    p.add_argument("--share_weights", action="store_true",
                   help="the share_weights ablation (one fuser/head reused "
                        "across iterations) — must match the checkpoint")
    p.add_argument("--ignore_rotmat", action="store_true",
                   help="the ignore_rotmat ablation (no rotation "
                        "constraint) — must match the checkpoint")
    p.add_argument("--encode_rotmat", action="store_true",
                   help="the encode_rotmat ablation — must match the "
                        "checkpoint (two-view only)")
    p.add_argument("--share_feature", action="store_true",
                   help="the share_feature ablation — must match the "
                        "checkpoint (two-view only)")
    p.add_argument("--f32", action="store_true", help="float32 compute")
    p.add_argument("--int8", action="store_true",
                   help="int8 MXU backbone convs with dynamic activation "
                        "scales (same checkpoint, small quantization error)")
    p.add_argument("--int8_static", action="store_true",
                   help="int8 with CALIBRATED activation scales (1.24x bf16 "
                        "on v5e; auto-calibrates on the first request)")
    p.add_argument("--calibration", default=None,
                   help="with --int8_static: path to persist/restore the "
                        "calibrated activation ranges (loaded if present, "
                        "auto-saved after the first calibration)")
    p.add_argument("--dp", action="store_true",
                   help="shard each micro-batch over ALL visible chips "
                        "(data-parallel serving; params replicated)")
    p.add_argument("--spatial_partition", type=int, default=1,
                   help="shard each image's HEIGHT over groups of N chips "
                        "(GSPMD conv halo exchange) — lets ONE request use "
                        "N chips for latency; combines with --dp over "
                        "device_count/N groups. Implies the mesh path")
    p.add_argument("--coalesce_ms", type=float, default=2.0,
                   help="dynamic batching: max wait to fill a shared "
                        "micro-batch from concurrent requests")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rot_mvgaze_tpu.serving import GazePredictor, MultiViewGazePredictor
    from rot_mvgaze_tpu.utils.cache import enable_compile_cache

    if args.num_views < 2:
        raise SystemExit(f"--num_views must be >= 2, got {args.num_views}")
    if args.num_views > 2:
        # same support matrix as the training CLI (--num_views there):
        # spatial partitioning and the two stereo-only ablations are refused
        bad = [
            flag
            for flag, on in (
                ("--spatial_partition > 1", args.spatial_partition > 1),
                ("--encode_rotmat", args.encode_rotmat),
                ("--share_feature", args.share_feature),
            )
            if on
        ]
        if bad:
            raise SystemExit(
                f"--num_views {args.num_views} does not support: "
                f"{', '.join(bad)}"
            )

    # persistent executable cache: server restarts skip the multi-minute
    # tunnel compile entirely
    enable_compile_cache()

    mesh = None
    sp = max(args.spatial_partition, 1)
    if (args.dp or sp > 1) and jax.device_count() > 1:
        from rot_mvgaze_tpu.parallel.mesh import dp_size, make_mesh

        if sp > 1 and args.image_size % sp:
            raise SystemExit(
                f"--spatial_partition {sp} must divide --image_size "
                f"{args.image_size}"
            )
        mesh = make_mesh(spatial=sp)
        print(
            f"serving over {mesh.devices.size} chips"
            + (f" (spatial partition {sp}, dp {dp_size(mesh)})"
               if sp > 1 else " (data-parallel)")
        )
    elif sp > 1:
        raise SystemExit(
            f"--spatial_partition {sp} needs >1 visible device "
            f"(have {jax.device_count()})"
        )

    common = dict(
        backbone_depth=args.backbone_depth,
        num_iter=args.num_iter,
        share_weights=args.share_weights,
        ignore_rotmat=args.ignore_rotmat,
        micro_batch=args.micro_batch,
        image_size=args.image_size,
        dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        int8="static" if args.int8_static else args.int8,
        calibration_path=args.calibration,
        mesh=mesh,
    )
    if args.num_views > 2:
        predictor = MultiViewGazePredictor(
            args.ckpt, num_views=args.num_views, **common
        )
    else:
        predictor = GazePredictor(
            args.ckpt,
            encode_rotmat=args.encode_rotmat,
            share_feature=args.share_feature,
            **common,
        )
    # compile every executable before accepting traffic (static-int8: both
    # the calibration and frozen graphs, noise calibration discarded)
    predictor.warmup()
    from rot_mvgaze_tpu.serving import BatchingPredictor

    predictor = BatchingPredictor(predictor, max_delay_ms=args.coalesce_ms)
    stats = {"requests": 0, "samples": 0, "time": 0.0}
    # body cap is sized per view pair; a V-view request carries ceil(V/2)x
    # the pixels of a stereo one at the same batch size
    max_body = MAX_BODY_BYTES * max(1, (args.num_views + 1) // 2)
    server = ThreadingHTTPServer(
        ("0.0.0.0", args.port),
        build_handler(predictor, stats, max_body_bytes=max_body),
    )
    print(f"serving on :{args.port} (micro_batch={args.micro_batch})", flush=True)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
