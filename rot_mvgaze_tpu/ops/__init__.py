"""Pallas TPU kernels for the model's hot custom ops.

The reference has no native tier (SURVEY.md §2.3); on TPU the equivalent is
Pallas/Mosaic kernels for the rotate-and-fuse block plus XLA fusions for
everything conv-shaped.
"""

from rot_mvgaze_tpu.ops.fusion import (
    fused_image_feat_fuser,
    rotate_concat_matmul_relu,
)

__all__ = ["fused_image_feat_fuser", "rotate_concat_matmul_relu"]
