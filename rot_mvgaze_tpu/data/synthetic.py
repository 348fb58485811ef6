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


def write_synthetic_h5(
    path: str,
    n_frames: int = 4,
    n_cameras: int = 18,
    image_size: int = 32,
    seed: int = 0,
) -> str:
    """Write one synthetic subject archive; returns ``path``."""
    import h5py

    rng = np.random.default_rng(seed)
    n = n_frames * n_cameras
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w", libver="latest") as f:
        f.create_dataset(
            "face_patch",
            data=rng.integers(0, 256, (n, image_size, image_size, 3), dtype=np.uint8),
        )
        f.create_dataset(
            "face_gaze", data=rng.uniform(-1.0, 1.0, (n, 2)).astype(np.float32)
        )
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
        )
    return subjects
