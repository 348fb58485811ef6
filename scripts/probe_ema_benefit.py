#!/usr/bin/env python
"""Quantify --ema_decay: EMA vs raw-params eval error (VERDICT r4 item #8).

The EMA machinery is fully wired (train/steps.py update_ema, eval/export
prefer the EMA tree) but no experiment showed it helps. This is the cheap
CPU rehearsal: train R18/32² on a LEARNABLE synthetic corpus
(data/synthetic.py learnable=True — labels decodable from pixels, so eval
error genuinely converges) and score BOTH weight trees on the held-out
split after every epoch.

Expected shape of the result, for honest reading: early epochs the EMA
LAGS (it averages in the poor init); once the raw trajectory starts
oscillating around a basin the EMA should match or beat the raw params.
Whatever comes out is recorded in docs/ — the point is a number, not a
victory.

Usage: python scripts/probe_ema_benefit.py [--epochs 8] [--decay 0.98]
       [--out PATH]   (runs on CPU in a few minutes)
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

# CPU probe by design: honor JAX_PLATFORMS=cpu before any backend init
# (the session sitecustomize force-registers the TPU otherwise, and this
# probe must never contend with a chip-holding training run).
from rot_mvgaze_tpu.utils.drivers import honor_cpu_platform_env  # noqa: E402

honor_cpu_platform_env()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--decay", type=float, default=0.98)
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--frames", type=int, default=8,
                    help="frames/subject; 2 train subjects + 1 eval")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if not (0.0 < args.decay < 1.0):
        # decay=0 (passthrough) or 1.0 (frozen init) would score a
        # meaningless "EMA" and record it as a legitimate measurement —
        # same bound the Trainer/CLI enforce for --ema_decay
        ap.error(f"--decay must be in (0, 1); got {args.decay}")
    if args.epochs < 1:
        ap.error(f"--epochs must be >= 1; got {args.epochs}")

    import jax
    import jax.numpy as jnp

    from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
    from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset
    from rot_mvgaze_tpu.geometry import angular_error_numpy
    from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
    from rot_mvgaze_tpu.models import FeatRotationSymm
    from rot_mvgaze_tpu.train.steps import make_eval_step, make_train_step
    from rot_mvgaze_tpu.train.trainer import TrainState, make_optimizer

    S = args.image_size
    work = tempfile.mkdtemp(prefix="ema_probe_")
    train_names = write_synthetic_dataset(
        work, ["t0.h5", "t1.h5"], n_frames=args.frames, image_size=S,
        learnable=True, seed=10,
    )
    eval_names = write_synthetic_dataset(
        work, ["e0.h5"], n_frames=max(args.frames // 2, 2), image_size=S,
        learnable=True, seed=77,
    )
    train_ds = GazeDataset("xgaze", work, "bgr", train_names, seed=args.seed)
    eval_ds = GazeDataset("xgaze", work, "bgr", eval_names, seed=args.seed)
    train_loader = BatchLoader(train_ds, batch_size=args.batch, shuffle=True,
                               drop_last=True)
    eval_loader = BatchLoader(eval_ds, batch_size=args.batch)

    model = FeatRotationSymm(backbone_depth=18, num_iter=1)
    metrics = IterationLoss(loss=StereoL1Loss(rel_weight=0.01),
                            iter_decay=0.5)
    tx = make_optimizer(lambda _t: args.lr)
    from rot_mvgaze_tpu.utils.drivers import make_init_data

    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed)}, make_init_data(S)
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
    )
    step = jax.jit(
        make_train_step(model, metrics, tx, image_size=S,
                        ema_decay=args.decay)
    )
    eval_step = jax.jit(make_eval_step(model, image_size=S))

    def eval_error(params, batch_stats):
        errs = []
        for b in eval_loader:
            out = eval_step(params, batch_stats, b)
            errs.append(angular_error_numpy(
                np.asarray(out["pred_gaze"], np.float64),
                np.asarray(out["gt_gaze"], np.float64),
            ))
        return float(np.mean(np.concatenate(errs)))

    key = jax.random.PRNGKey(args.seed)
    history = []
    t0 = time.time()
    for epoch in range(args.epochs):
        for i, batch in enumerate(train_loader):
            key, sub = jax.random.split(key)
            state, stats = step(state, batch, sub)
        raw = eval_error(state.params, state.batch_stats)
        ema = eval_error(state.ema_params, state.batch_stats)
        history.append({"epoch": epoch + 1, "raw_deg": round(raw, 3),
                        "ema_deg": round(ema, 3)})
        print(f"epoch {epoch + 1}: raw={raw:.3f} ema={ema:.3f} "
              f"[{time.time() - t0:.0f}s]", file=sys.stderr, flush=True)

    last = history[-1]
    record = {
        "decay": args.decay,
        "epochs": args.epochs,
        "train_rows": len(train_ds),
        "eval_rows": len(eval_ds),
        "history": history,
        "final_raw_deg": last["raw_deg"],
        "final_ema_deg": last["ema_deg"],
        "ema_better_final": last["ema_deg"] < last["raw_deg"],
        "ema_better_best": min(h["ema_deg"] for h in history)
        < min(h["raw_deg"] for h in history),
    }
    print(json.dumps(record))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=2)
    train_ds.close()
    eval_ds.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
