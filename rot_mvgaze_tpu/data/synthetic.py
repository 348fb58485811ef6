"""Synthetic in-file dataset fixtures.

The reference has no test data; this writer produces tiny HDF5 archives with
the exact schema/layout of the real datasets (``face_patch (N,H,W,3) uint8``,
``face_gaze (N,2)``, ``face_head_pose (N,2)``, rows frame-major over 18
cameras — /root/reference/dataset/gaze.py:62-73,120-122) so data-layer tests,
the CLI smoke path, and benches run without the real corpora.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


#: Label range (rad) and normalization half-range of the learnable corpus.
LEARNABLE_GAZE_RANGE = 0.6
_LEARNABLE_NORM = 0.7


def _learnable_rows(rng, n: int, image_size: int):
    """Images whose gaze label is DECODABLE from pixel content: a bright
    disc over mid-gray noise, centered at the position that linearly
    encodes (pitch, yaw). Built to survive the reference's augmentation
    stack (/root/reference/main.py:41-49): no rotation jitter (degrees=0),
    translate is ±1%, and brightness scaling preserves the disc's local
    contrast — so a sustained training run on this corpus can drive eval
    error genuinely low, demonstrating the full recipe end-to-end where
    random-label corpora only allow memorization."""
    S = image_size
    gaze = rng.uniform(
        -LEARNABLE_GAZE_RANGE, LEARNABLE_GAZE_RANGE, (n, 2)
    ).astype(np.float32)
    imgs = rng.integers(96, 161, (n, S, S, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:S, 0:S]
    r2 = (S / 8.0) ** 2
    # disc center: pitch -> row, yaw -> col (margin via the 0.7 half-range)
    cy = (gaze[:, 0] / _LEARNABLE_NORM + 1.0) / 2.0 * (S - 1)
    cx = (gaze[:, 1] / _LEARNABLE_NORM + 1.0) / 2.0 * (S - 1)
    for i in range(n):
        mask = (yy - cy[i]) ** 2 + (xx - cx[i]) ** 2 <= r2
        imgs[i][mask] = 255
    return imgs, gaze


def write_synthetic_h5(
    path: str,
    n_frames: int = 4,
    n_cameras: int = 18,
    image_size: int = 32,
    seed: int = 0,
    learnable: bool = False,
) -> str:
    """Write one synthetic subject archive; returns ``path``.

    ``learnable=True`` encodes the gaze label in the pixels (bright disc at
    the label-determined position) so training can actually converge; the
    default writes label-independent noise (sufficient for protocol/parity
    tests, where only determinism matters)."""
    import h5py

    rng = np.random.default_rng(seed)
    n = n_frames * n_cameras
    if learnable:
        imgs, gaze = _learnable_rows(rng, n, image_size)
    else:
        imgs = rng.integers(
            0, 256, (n, image_size, image_size, 3), dtype=np.uint8
        )
        gaze = rng.uniform(-1.0, 1.0, (n, 2)).astype(np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w", libver="latest") as f:
        f.create_dataset("face_patch", data=imgs)
        f.create_dataset("face_gaze", data=gaze)
        f.create_dataset(
            "face_head_pose", data=rng.uniform(-0.8, 0.8, (n, 2)).astype(np.float32)
        )
    return path


def write_synthetic_dataset(
    root: str,
    subjects: Optional[list] = None,
    n_frames: int = 4,
    image_size: int = 32,
    seed: int = 0,
    n_cameras: int = 18,
    learnable: bool = False,
) -> list:
    """Write several subject archives under ``root``; returns the filenames."""
    subjects = subjects if subjects is not None else ["s00.h5", "s01.h5"]
    for i, name in enumerate(subjects):
        write_synthetic_h5(
            os.path.join(root, name),
            n_frames=n_frames,
            n_cameras=n_cameras,
            image_size=image_size,
            seed=seed + i,
            learnable=learnable,
        )
    return subjects
