"""Stereo pair-index construction and camera splits.

Parity with /root/reference/dataset/gaze.py:39-73: rows are frame-major over
18 cameras (``camera = idx % 18``); the partner view for each valid index is
sampled ONCE at construction among the other valid cameras of the SAME frame.

Two pairing modes:

- ``build_pair_index`` — a dedicated ``numpy.random.Generator`` makes pairing
  reproducible and independent of other consumers of randomness (the repo's
  original mode; same distribution as the reference, different index).
- ``build_pair_index_reference`` / ``reference_pair_indices`` — BIT-EXACT
  reproduction of the reference's frozen pairing. The reference draws
  partners from the globally-seeded stdlib Mersenne-Twister ``random.choice``
  (/root/reference/dataset/gaze.py:72, seeded at main.py:216 via
  utils/util.py:8), and builds the TRAIN dataset before the TEST dataset
  (main.py:224 -> configure_dataset:121-209), so the test-set pairing
  depends on every draw the train-set construction consumed first.
  ``reference_pair_indices`` replays that exact sequence. The released
  checkpoints' eval numbers are means over THIS pair index, so protocol-level
  parity (BASELINE.json's <=0.1 deg target) requires the reference mode.
"""

from __future__ import annotations

import random as _stdlib_random
from typing import Dict, List, Optional, Sequence, Tuple

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


def _iter_frame_candidates(n, cameras, num_cameras):
    """Yield ``(idx, candidates)`` for every in-split row of an ``n``-row
    file: ``candidates`` are the OTHER in-split rows of the same frame
    (the shared scan of the "rng"-mode builders; the reference-replay
    builder keeps its own literal mirror of the reference loop).
    """
    valid_set = {i for i in range(n) if (i % num_cameras) in cameras}
    for idx in sorted(valid_set):
        frame_start = (idx // num_cameras) * num_cameras
        candidates = [
            i
            for i in range(frame_start, frame_start + num_cameras)
            if i in valid_set and i != idx
        ]
        yield idx, candidates


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
        for idx, candidates in _iter_frame_candidates(n, cameras, num_cameras):
            if candidates:
                idx_b = int(candidates[rng.integers(len(candidates))])
                index.append((file_i, idx, idx_b))
    return index


def build_pair_index_reference(
    file_sizes: Sequence[int],
    camera_tag: str = "all",
    rng: Optional[_stdlib_random.Random] = None,
    seed: int = 0,
    num_cameras: int = NUM_CAMERAS,
) -> PairIndex:
    """Bit-exact reproduction of /root/reference/dataset/gaze.py:60-73.

    Every partner is drawn with stdlib ``Random.choice`` (Mersenne Twister) in
    the reference's exact iteration order, so given the same generator state
    the resulting index is IDENTICAL to the reference's ``idx_to_kv`` —
    including the variable number of ``getrandbits`` words ``choice`` consumes
    per draw (``_randbelow`` rejection sampling), which makes any
    reimplementation with a different generator diverge.

    Pass a shared ``rng`` to replay a multi-dataset construction sequence
    (see :func:`reference_pair_indices`); otherwise a fresh
    ``Random(seed)`` matches a reference run whose only global-``random``
    consumer is this one dataset.
    """
    if rng is None:
        rng = _stdlib_random.Random(seed)
    cameras_idx = CAMERA_TAGS[camera_tag]
    index: PairIndex = []
    for file_i, n in enumerate(file_sizes):
        # Mirror of the reference loop (dataset/gaze.py:65-73): list-based
        # membership, same candidate ordering, stdlib choice.
        valid_indices = [i for i in range(0, n) if (i % num_cameras) in cameras_idx]
        valid_set = set(valid_indices)  # membership only; order from range()
        for idx in valid_indices:
            frame_start = (idx // num_cameras) * num_cameras
            frame_valid_indices = [
                i
                for i in range(frame_start, frame_start + num_cameras)
                if i in valid_set and i != idx
            ]
            if frame_valid_indices:
                idx_b = rng.choice(frame_valid_indices)
                index.append((file_i, idx, idx_b))
    return index


def resolve_pair_index(
    file_sizes: Sequence[int],
    camera_tag: str,
    pairing: str = "reference",
    pair_rng: Optional[_stdlib_random.Random] = None,
    seed: int = 0,
    pair_index: Optional[PairIndex] = None,
    num_cameras: int = NUM_CAMERAS,
) -> PairIndex:
    """The shared pairing-mode dispatch used by both dataset constructors
    (``GazeDataset`` and ``PackedGazeDataset``): an explicit ``pair_index``
    wins, else ``pairing`` selects ``"reference"`` (bit-exact replay, see
    :func:`build_pair_index_reference`) or ``"rng"`` (independent
    seeded-numpy mode)."""
    if pair_index is not None:
        return list(pair_index)
    if pairing == "reference":
        return build_pair_index_reference(
            file_sizes, camera_tag, rng=pair_rng, seed=seed,
            num_cameras=num_cameras,
        )
    if pairing == "rng":
        return build_pair_index(
            file_sizes, camera_tag, seed=seed, num_cameras=num_cameras
        )
    raise ValueError(f"unknown pairing mode: {pairing!r}")


def reference_pair_indices(
    train_file_sizes: Sequence[int],
    train_camera_tag: str,
    test_file_sizes: Sequence[int],
    test_camera_tag: str,
    seed: int = 0,
    num_cameras: int = NUM_CAMERAS,
) -> Tuple[PairIndex, PairIndex]:
    """Replay the reference's full pairing sequence for one experiment.

    The reference seeds the global ``random`` (main.py:216 ->
    utils/util.py:8) and then constructs the train dataset FIRST and the test
    dataset SECOND (main.py:224, configure_dataset:130-205); nothing else
    consumes global ``random`` in between (``np.random.seed``/
    ``torch.manual_seed`` seed their own generators). The test-set pairing
    therefore depends on the train-set draws. Returns
    ``(train_index, test_index)`` identical to the two datasets'
    ``idx_to_kv`` under the reference protocol.
    """
    rng = _stdlib_random.Random(seed)
    train = build_pair_index_reference(
        train_file_sizes, train_camera_tag, rng=rng, num_cameras=num_cameras
    )
    test = build_pair_index_reference(
        test_file_sizes, test_camera_tag, rng=rng, num_cameras=num_cameras
    )
    return train, test


MultiViewIndex = List[Tuple[int, Tuple[int, ...]]]  # (file_idx, view rows)


def build_multiview_index(
    file_sizes: Sequence[int],
    camera_tag: str = "all",
    n_views: int = 3,
    seed: int = 0,
    num_cameras: int = NUM_CAMERAS,
) -> MultiViewIndex:
    """V-view generalization of :func:`build_pair_index`.

    For every in-split row, ``n_views - 1`` DISTINCT partner rows are drawn
    without replacement from the other in-split cameras of the same frame
    (the stereo builders draw exactly one — /root/reference/dataset/
    gaze.py:60-73 has no V>2 counterpart, this is framework-added for
    ``models.multiview.FeatRotationMultiView``). Rows whose frame has fewer
    than ``n_views - 1`` other valid cameras (a short final file) are
    SKIPPED, mirroring the stereo builders' skip of partner-less rows — but
    an ``n_views`` that NO frame of the split can ever satisfy (more views
    than in-split cameras) is a configuration error and raises, so e.g.
    ``--num_views 7`` against the 6-camera ``novel_test`` split refuses
    loudly instead of training/evaluating an empty dataset. Sampled once at
    construction with a dedicated ``numpy.random.Generator(seed)`` (the
    "rng" pairing mode's determinism contract).
    """
    if n_views < 2:
        raise ValueError(f"n_views must be >= 2, got {n_views}")
    cameras = set(CAMERA_TAGS[camera_tag])
    if n_views > len(cameras):
        raise ValueError(
            f"n_views={n_views} exceeds the {len(cameras)} cameras of the "
            f"{camera_tag!r} split — every frame would be skipped and the "
            f"dataset would be empty"
        )
    rng = np.random.default_rng(seed)
    index: MultiViewIndex = []
    for file_i, n in enumerate(file_sizes):
        for idx, candidates in _iter_frame_candidates(n, cameras, num_cameras):
            if len(candidates) >= n_views - 1:
                partners = rng.choice(
                    np.asarray(candidates, dtype=np.int64),
                    size=n_views - 1,
                    replace=False,
                )
                index.append(
                    (file_i, (idx, *(int(p) for p in partners)))
                )
    return index
