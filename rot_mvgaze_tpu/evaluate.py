"""Standalone evaluation helpers (outside the Trainer loop).

``evaluate_gaze`` reproduces the reference eval protocol
(/root/reference/trainer.py:164-199): jitted forward over the test loader,
mean angular error in degrees computed host-side in float64. Works for both
the two-view FeatRotationSymm and the single-view baseline.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from rot_mvgaze_tpu.augment.ops import eval_preprocess
from rot_mvgaze_tpu.geometry import angular_error_numpy, rotation_matrix_2d


def evaluate_gaze(
    model: Any,
    variables: Dict[str, Any],
    loader: Iterable,
    image_size: int = 224,
    single_view: bool = False,
) -> float:
    """Mean angular error (degrees, float64 host math) over a test loader."""

    @jax.jit
    def step(batch):
        data: Dict[str, Any] = {
            "img_0": eval_preprocess(batch["img_0"], image_size)
        }
        if not single_view:
            data["img_1"] = eval_preprocess(batch["img_1"], image_size)
            data["rot_0"] = rotation_matrix_2d(
                batch["head_pose_0"].astype(jnp.float32)
            )
            data["rot_1"] = rotation_matrix_2d(
                batch["head_pose_1"].astype(jnp.float32)
            )
        out = model.apply(variables, data, train=False)
        return out["pred_gaze"]

    from rot_mvgaze_tpu.utils.padding import pad_batch

    preds, gts = [], []
    # Pad every batch to the first-seen (full) batch size so the jitted step
    # compiles exactly once — a ragged final batch would otherwise trigger a
    # second multi-minute compile on a tunneled TPU. Padding repeats the last
    # sample; its predictions are trimmed before the metric.
    full_bs = None
    for batch in loader:
        device_batch = {
            k: np.asarray(v)
            for k, v in batch.items()
            if k in ("img_0", "img_1", "head_pose_0", "head_pose_1")
        }
        bs = device_batch["img_0"].shape[0]
        if full_bs is None:
            full_bs = bs
        device_batch = pad_batch(device_batch, full_bs)
        preds.append(np.asarray(step(device_batch))[:bs])
        gts.append(np.asarray(batch["gt_gaze"]))
    pred_all = np.concatenate(preds)
    gt_all = np.concatenate(gts)
    return float(np.mean(angular_error_numpy(pred_all, gt_all)))
