"""Stereo pair-index construction and camera splits.

Parity with /root/reference/dataset/gaze.py:39-73: rows are frame-major over
18 cameras (``camera = idx % 18``); the partner view for each valid index is
sampled ONCE at construction among the other valid cameras of the SAME frame.
The reference draws partners from the globally-seeded ``random`` module
(:72); here a dedicated ``numpy.random.Generator`` makes pairing reproducible
and independent of other consumers of randomness.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

NUM_CAMERAS = 18

# Camera splits (/root/reference/dataset/gaze.py:39-44): 'novel_test' holds
# out every third camera starting at 2; 'novel_train' is the complement.
CAMERA_TAGS: Dict[str, List[int]] = {
    "all": list(range(NUM_CAMERAS)),
    "novel_train": [c for c in range(NUM_CAMERAS) if c not in range(2, NUM_CAMERAS, 3)],
    "novel_test": list(range(2, NUM_CAMERAS, 3)),
}

PairIndex = List[Tuple[int, int, int]]  # (file_idx, idx, partner_idx)


def build_pair_index(
    file_sizes: Sequence[int],
    camera_tag: str = "all",
    seed: int = 0,
    num_cameras: int = NUM_CAMERAS,
) -> PairIndex:
    """Build the (file, idx, partner) stereo index for a list of HDF5 sizes.

    ``file_sizes[i]`` is ``face_patch.shape[0]`` of file ``i``. For every row
    whose camera is in the split, one partner row is drawn uniformly from the
    other in-split cameras of the same frame
    (/root/reference/dataset/gaze.py:60-73).
    """
    cameras = set(CAMERA_TAGS[camera_tag])
    rng = np.random.default_rng(seed)
    index: PairIndex = []
    for file_i, n in enumerate(file_sizes):
        valid = np.array(
            [i for i in range(n) if (i % num_cameras) in cameras], dtype=np.int64
        )
        valid_set = set(valid.tolist())
        for idx in valid.tolist():
            frame_start = (idx // num_cameras) * num_cameras
            candidates = [
                i
                for i in range(frame_start, frame_start + num_cameras)
                if i in valid_set and i != idx and i < n
            ]
            if candidates:
                idx_b = int(candidates[rng.integers(len(candidates))])
                index.append((file_i, idx, idx_b))
    return index
