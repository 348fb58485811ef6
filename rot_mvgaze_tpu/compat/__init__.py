"""PyTorch -> JAX checkpoint conversion.

Loads the reference's released ``.pth.tar`` state dicts
(/root/reference/README.md:45-50, saved by /root/reference/trainer.py:150-160)
into this framework's flax variable trees, and converts back for interop.
"""

from rot_mvgaze_tpu.compat.torch_convert import (
    convert_resnet_state_dict,
    convert_rot_mv_state_dict,
    flax_to_torch_state_dict,
    load_pretrained_backbone,
    load_torch_state_dict,
)
from rot_mvgaze_tpu.compat.download import (
    download_pretrained,
    resolve_pretrained_backbone,
)

__all__ = [
    "convert_resnet_state_dict",
    "convert_rot_mv_state_dict",
    "download_pretrained",
    "flax_to_torch_state_dict",
    "load_pretrained_backbone",
    "load_torch_state_dict",
    "resolve_pretrained_backbone",
]
