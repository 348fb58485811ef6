"""L2 preprocessing/augmentation — pure functions, PRNG-key driven, compiled
into the train step on device.

Reference semantics: the torchvision stacks at /root/reference/main.py:38-56
and RandomMultiErasing at /root/reference/utils/augment.py:10-47. Train-time
augmentation is distribution-matched (stochastic); the deterministic eval
path (to-float -> resize -> normalize) is numerically exact.
"""

from rot_mvgaze_tpu.augment.ops import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    color_jitter,
    normalize,
    random_affine,
    random_multi_erasing,
    eval_preprocess,
    resize_bilinear,
    test_preprocess,
    train_preprocess,
)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "color_jitter",
    "normalize",
    "random_affine",
    "random_multi_erasing",
    "eval_preprocess",
    "resize_bilinear",
    "test_preprocess",
    "train_preprocess",
]
