"""L3 model layer: flax.linen modules, NHWC layouts, dict-pytree in/out.

Reference: /root/reference/models/{resnet.py,rot_mv.py,backbones/blocks.py}.
"""

from rot_mvgaze_tpu.models.blocks import Mlp
from rot_mvgaze_tpu.models.resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
)
from rot_mvgaze_tpu.models.multiview import FeatRotationMultiView
from rot_mvgaze_tpu.models.rot_mv import FeatRotationSymm
from rot_mvgaze_tpu.models.single import SingleViewGazeNet

__all__ = [
    "Mlp",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "resnext50_32x4d",
    "resnext101_32x8d",
    "wide_resnet50_2",
    "wide_resnet101_2",
    "FeatRotationSymm",
    "FeatRotationMultiView",
    "SingleViewGazeNet",
]
