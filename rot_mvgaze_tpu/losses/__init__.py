"""L4 loss layer: pure functions over the model's output pytree.

Reference: /root/reference/losses/{gaze_loss.py,stereo_loss.py}.
"""

from rot_mvgaze_tpu.losses.gaze import (
    gaze_angular_loss,
    gaze_l1_loss,
    gaze_l2_loss,
    make_gaze_loss,
)
from rot_mvgaze_tpu.losses.multiview import MultiViewL1Loss
from rot_mvgaze_tpu.losses.stereo import IterationLoss, StereoL1Loss

__all__ = [
    "gaze_angular_loss",
    "gaze_l1_loss",
    "gaze_l2_loss",
    "make_gaze_loss",
    "StereoL1Loss",
    "MultiViewL1Loss",
    "IterationLoss",
]
