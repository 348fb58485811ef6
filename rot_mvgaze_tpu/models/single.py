"""Single-view gaze regression baseline.

BASELINE.json config #1: "ResNet-18 single-view gaze regression (ETH-XGaze
224^2 crops, angular-error eval)". The reference repo has no such model class
(its GazeDataset supports ``stereo=False``, /root/reference/dataset/gaze.py:132,
but the only model is two-view); this provides the standard backbone + MLP
pitchyaw head so single-view experiments and ablation baselines run in the
same framework.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import flax.linen as nn
import jax.numpy as jnp

from rot_mvgaze_tpu.models.blocks import Mlp
from rot_mvgaze_tpu.models.resnet import BACKBONES


class SingleViewGazeNet(nn.Module):
    """ResNet backbone -> MLP -> (pitch, yaw)."""

    backbone_depth: int = 18
    head_hidden: int = 512
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Any = None
    use_pallas_bn: bool = False
    remat: bool = False

    def setup(self) -> None:
        self.backbone = BACKBONES[self.backbone_depth](
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            bn_axis_name=self.bn_axis_name,
            use_pallas_bn=self.use_pallas_bn,
            remat=self.remat,
            name="backbone",
        )
        self.gaze_estimator = Mlp(
            features=[self.head_hidden, 2],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="gaze_estimator",
        )

    def __call__(
        self,
        data: Union[Dict[str, Any], jnp.ndarray],
        train: bool = False,
    ) -> Union[Dict[str, Any], jnp.ndarray]:
        """Accepts either a raw NHWC image batch (returns pitchyaw) or the
        dict contract (reads ``img_0``, adds ``img_feat_0``/``pred_gaze``)."""
        if isinstance(data, dict):
            feat = self.backbone(data["img_0"], train)
            pred = self.gaze_estimator(feat)
            out = dict(data)
            out.update({"img_feat_0": feat, "pred_gaze": pred})
            return out
        feat = self.backbone(data, train)
        return self.gaze_estimator(feat)
