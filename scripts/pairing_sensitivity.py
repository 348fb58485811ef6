"""Measure how the eval mean angular error moves across pairing seeds.

VERDICT r2 weak #3: the reference eval protocol is defined over its frozen
stereo pair index (/root/reference/dataset/gaze.py:60-73); the <=0.1 deg
parity target is a mean over THOSE partner views. This experiment quantifies
the metric's sensitivity to the pairing: train a model briefly on a synthetic
corpus, freeze the checkpoint, then evaluate the SAME checkpoint over the
SAME rows with the partner index re-drawn under different seeds. The spread
of the per-seed mean errors is the pairing-sensitivity bound.

Since round 3 the CLI defaults to ``--pairing reference`` (bit-exact replay
of the reference's frozen index, tests/test_pairing_reference.py), so
protocol evals no longer depend on this bound at all — the experiment
documents why that default matters (or how benign a re-draw would be).

Usage::

    python scripts/pairing_sensitivity.py [--out docs/pairing_sensitivity.json]
        [--seeds 8] [--epochs 4] [--backbone 18] [--image_size 64]

Writes one JSON record with per-seed mean errors and summary stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor an explicit JAX_PLATFORMS=cpu even though the session sitecustomize
# force-selects the TPU platform via jax.config — the env var alone cannot
# win against that (same pattern as bench.py / __graft_entry__.py).
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/pairing_sensitivity.json")
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--backbone", type=int, default=18)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--n_frames", type=int, default=6)
    p.add_argument("--batch_size", type=int, default=18)
    args = p.parse_args()

    import numpy as np
    from types import SimpleNamespace

    from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
    from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset
    from rot_mvgaze_tpu.evaluate import evaluate_gaze
    from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
    from rot_mvgaze_tpu.models import FeatRotationSymm
    from rot_mvgaze_tpu.train import Trainer

    with tempfile.TemporaryDirectory() as root:
        subjects = write_synthetic_dataset(
            root, ["s00.h5", "s01.h5"], n_frames=args.n_frames,
            image_size=args.image_size,
        )
        train_ds = GazeDataset("xgaze", root, "bgr", subjects, seed=0)
        train_loader = BatchLoader(
            train_ds, batch_size=args.batch_size, shuffle=True, drop_last=True
        )
        eval_base = GazeDataset("xgaze", root, "bgr", subjects, seed=0)
        base_loader = BatchLoader(eval_base, batch_size=args.batch_size)

        cfg = SimpleNamespace(
            mode="train", exp_name="pairing_sensitivity",
            output_dir=os.path.join(root, "_logs"),  # inside the
            # TemporaryDirectory so checkpoints/TB events are cleaned up
            ckpt_resume=None, print_freq=10**9, seed=0,
            batch_size=args.batch_size, test_batch_size=args.batch_size,
            epochs=args.epochs, save_epoch=10**9,
            image_size=args.image_size, scheduler_step="epoch",
        )
        model = FeatRotationSymm(backbone_depth=args.backbone, num_iter=3)
        metrics = IterationLoss(
            loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5
        )
        trainer = Trainer(cfg, model, metrics, train_loader, base_loader)
        for epoch in range(args.epochs):
            trainer.train_one_epoch(epoch)
        import jax

        variables = {
            "params": jax.device_get(trainer.state.params),
            "batch_stats": jax.device_get(trainer.state.batch_stats),
        }

        # Frozen checkpoint, re-drawn pairings: only the PARTNER of each row
        # changes between seeds; view-0 rows and their GT stay fixed.
        per_seed = {}
        for s in range(args.seeds):
            ds = GazeDataset(
                "xgaze", root, "bgr", subjects, camera_tag="all",
                pairing="rng", seed=s,
            )
            loader = BatchLoader(ds, batch_size=args.batch_size)
            per_seed[s] = evaluate_gaze(
                model, variables, loader, image_size=args.image_size
            )
            ds.close()
            print(f"pairing seed {s}: mean error {per_seed[s]:.4f} deg")

        # the protocol index (reference mode) for the same corpus
        ref_ds = GazeDataset(
            "xgaze", root, "bgr", subjects, camera_tag="all",
            pairing="reference", seed=0,
        )
        ref_loader = BatchLoader(ref_ds, batch_size=args.batch_size)
        ref_error = evaluate_gaze(
            model, variables, ref_loader, image_size=args.image_size
        )
        ref_ds.close()
        train_ds.close()
        eval_base.close()

    errs = np.array(list(per_seed.values()))
    record = {
        "experiment": "pairing_sensitivity",
        "setup": {
            "backbone": args.backbone, "image_size": args.image_size,
            "n_samples": int(len(eval_base)), "train_epochs": args.epochs,
            "n_pairing_seeds": args.seeds,
        },
        "per_seed_mean_error_deg": {str(k): float(v) for k, v in per_seed.items()},
        "reference_pairing_mean_error_deg": float(ref_error),
        "spread_deg": float(errs.max() - errs.min()),
        "std_deg": float(errs.std()),
        "mean_deg": float(errs.mean()),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: record[k] for k in
                      ("spread_deg", "std_deg", "mean_deg",
                       "reference_pairing_mean_error_deg")}))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
