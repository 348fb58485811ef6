"""V-view supervised loss — the N-view generalization of StereoL1Loss.

``(L(g_0, gt_0) + reference_decay * sum_{v>=1} L(g_v, gt_v)) * rel_weight``
over the stacked ``pred_gazes``/``gt_gazes`` (B, V, 2) arrays produced by
``models.multiview.FeatRotationMultiView``. View 0 is the reference view
(the eval view, /root/reference/models/rot_mv.py:265); every other view is
an auxiliary supervision term with the same ``reference_decay`` weight the
stereo loss gives its single partner (/root/reference/losses/
stereo_loss.py:46-54). At V=2 this is numerically identical to
``StereoL1Loss`` — the sum over partners has one term — so multi-view and
stereo training share one loss scale.

Plugs into ``IterationLoss`` unchanged: the model emits ``iter_{i}`` dicts
and this consumes ``pred_gazes`` from each plus the common ``gt_gazes``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax.numpy as jnp

from rot_mvgaze_tpu.losses.gaze import make_gaze_loss


@dataclass(frozen=True)
class MultiViewL1Loss:
    """See module docstring. ``distance_metric`` mirrors StereoL1Loss's
    (angular only — the reference hardcodes it)."""

    rel_weight: float = 1.0
    reference_decay: float = 1.0
    distance_metric: str = "angular_error"

    def __call__(self, data: Dict[str, Any]) -> jnp.ndarray:
        if self.distance_metric != "angular_error":
            raise ValueError(
                f"MultiViewL1Loss only implements "
                f"distance_metric='angular_error'; got "
                f"{self.distance_metric!r}"
            )
        loss_fn = make_gaze_loss("angular")
        preds = data["pred_gazes"]  # (B, V, 2)
        gts = data["gt_gazes"]  # (B, V, 2)
        if preds.shape != gts.shape or preds.ndim != 3:
            raise ValueError(
                f"pred_gazes/gt_gazes must both be (B, V, 2); got "
                f"{preds.shape} vs {gts.shape}"
            )
        V = preds.shape[1]
        total = loss_fn(preds[:, 0], gts[:, 0])
        for v in range(1, V):  # V is static — unrolled at trace time
            total = total + loss_fn(preds[:, v], gts[:, v]) * self.reference_decay
        return total * self.rel_weight
