#!/usr/bin/env python
"""Export a serving artifact (serialized StableHLO) from a checkpoint.

    python scripts/export_model.py --ckpt logs/.../model.msgpack \
        --out artifacts/serving.stablehlo --micro_batch 64 \
        [--platforms tpu,cpu] [--backbone_depth 50] [--num_iter 3] ...

The artifact + checkpoint pair is served by
``rot_mvgaze_tpu.export.AotGazePredictor`` (or any PJRT host via
``jax.export.deserialize``) with no model-definition code required.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="msgpack checkpoint (TrainState or bare variables); "
                        ".pth.tar reference checkpoints are converted")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--micro_batch", type=int, default=64)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering platforms, e.g. tpu,cpu "
                        "(default: current backend)")
    p.add_argument("--backbone_depth", type=int, default=50)
    p.add_argument("--num_iter", type=int, default=3)
    p.add_argument("--num_views", type=int, default=2,
                   help="export the V-view model (V > 2): the artifact's "
                        "request is stacked imgs (B,V,H,W,3) + head_poses "
                        "(B,V,2). Stereo checkpoints load at any V")
    p.add_argument("--share_weights", action="store_true")
    p.add_argument("--encode_rotmat", action="store_true")
    p.add_argument("--share_feature", action="store_true")
    p.add_argument("--ignore_rotmat", action="store_true")
    p.add_argument("--f32", action="store_true",
                   help="export float32 compute (default bfloat16)")
    p.add_argument("--int8", action="store_true",
                   help="export the int8 MXU serving graph with dynamic "
                        "activation scales (ops/quant.py; static/calibrated "
                        "scales are live-serving-only — they need "
                        "representative data at load)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from rot_mvgaze_tpu.export import export_serving_artifact
    from rot_mvgaze_tpu.serving import GazePredictor, MultiViewGazePredictor

    if args.num_views < 2:
        raise SystemExit(f"--num_views must be >= 2, got {args.num_views}")
    if args.num_views > 2:
        if args.encode_rotmat or args.share_feature:
            raise SystemExit(
                f"--num_views {args.num_views} does not support "
                "--encode_rotmat / --share_feature (stereo-only ablations)"
            )
        predictor = MultiViewGazePredictor(
            args.ckpt,
            num_views=args.num_views,
            backbone_depth=args.backbone_depth,
            num_iter=args.num_iter,
            share_weights=args.share_weights,
            ignore_rotmat=args.ignore_rotmat,
            micro_batch=args.micro_batch,
            image_size=args.image_size,
            dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            int8=args.int8,
        )
    else:
        predictor = GazePredictor(
            args.ckpt,
            backbone_depth=args.backbone_depth,
            num_iter=args.num_iter,
            share_weights=args.share_weights,
            encode_rotmat=args.encode_rotmat,
            share_feature=args.share_feature,
            ignore_rotmat=args.ignore_rotmat,
            micro_batch=args.micro_batch,
            image_size=args.image_size,
            dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            int8=args.int8,
        )
    # strip: a natural "tpu, cpu" must not produce the platform name " cpu"
    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()] or None
    exported = export_serving_artifact(
        predictor.model,
        predictor.variables,
        args.out,
        micro_batch=args.micro_batch,
        image_size=args.image_size,
        platforms=platforms,
        num_views=args.num_views if args.num_views > 2 else None,
    )
    print(
        f"exported {args.out} ({os.path.getsize(args.out)} bytes), "
        f"platforms={exported.platforms}, "
        f"batch={args.micro_batch}x{args.image_size}^2"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
