"""V-view dataset over the same per-subject HDF5 archives.

The reference's dataset yields exactly two views per sample
(/root/reference/dataset/gaze.py:113-144) although each frame holds 18
cameras; this framework-added dataset yields ``n_views`` stacked views for
``models.multiview.FeatRotationMultiView``:

``{"imgs": (V,H,W,3) uint8, "gt_gazes": (V,2), "head_poses": (V,2),
   "idxs": (V,) int64}``

View 0 is the sample's own row (the eval view); partners are drawn once at
construction (``data.pairing.build_multiview_index``). All archive-handle
machinery (thread-local SWMR handles, generation-guarded close) is
inherited from :class:`~rot_mvgaze_tpu.data.hdf5.GazeDataset`.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

from rot_mvgaze_tpu.data.hdf5 import GazeDataset
from rot_mvgaze_tpu.data.pairing import build_multiview_index


class MultiViewGazeDataset(GazeDataset):
    """See module docstring."""

    def __init__(
        self,
        dataset_name: str,
        dataset_path: str,
        color_type: str,
        keys_to_use: Sequence[str],
        n_views: int = 3,
        camera_tag: str = "all",
        seed: int = 0,
    ) -> None:
        # Parent builds the handle machinery and reads file sizes; give it
        # an explicit empty pair index so no stereo pairing is drawn (this
        # dataset replaces idx_to_kv with the V-view index below).
        super().__init__(
            dataset_name,
            dataset_path,
            color_type,
            keys_to_use,
            camera_tag=camera_tag,
            stereo=True,
            seed=seed,
            pair_index=[],
        )
        self.n_views = int(n_views)
        self.idx_to_kv = build_multiview_index(
            self.file_sizes, camera_tag, n_views=self.n_views, seed=seed
        )
        if not self.idx_to_kv:
            # build_multiview_index already rejects n_views > split size;
            # this catches corpora whose every frame is truncated below
            # n_views rows — training 0 steps/epoch and a NaN eval mean
            # must not happen silently.
            raise ValueError(
                f"n_views={self.n_views} left no usable frame in "
                f"{dataset_name!r} (camera_tag={camera_tag!r}, "
                f"{len(self.file_sizes)} files): every frame has fewer "
                f"than {self.n_views} valid rows"
            )

    def __getitem__(self, index: int) -> Dict[str, Any]:
        key, idxs = self.idx_to_kv[index]
        hdf = self._archives()[key]
        views = [self._read_view(hdf, i) for i in idxs]
        return {
            "imgs": np.stack([v["img"] for v in views]),
            "gt_gazes": np.stack([v["gaze"] for v in views]),
            "head_poses": np.stack([v["head_pose"] for v in views]),
            "idxs": np.asarray(idxs, dtype=np.int64),
        }
