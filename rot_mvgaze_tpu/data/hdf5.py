"""HDF5-backed multi-view gaze dataset.

Capability parity with /root/reference/dataset/gaze.py:19-144, redesigned for
a TPU input pipeline:

- ``__getitem__`` returns RAW uint8 RGB images; float conversion, resize,
  normalization and augmentation run on-device (rot_mvgaze_tpu.augment),
  keeping host CPU work and host->device transfer minimal.
- Archives are opened lazily per accessing thread/process (SWMR), matching
  the reference's worker-safe lazy reopen (:99-103).
- The MPII-NV pitch sign flip (:123-124,135-136) and the xgaze BGR->RGB
  conversion (:106-111 via cv2) are applied here; BGR->RGB is a channel
  reversal, no cv2 needed.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, List, Sequence

import numpy as np

from rot_mvgaze_tpu.data.pairing import PairIndex, resolve_pair_index

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


class GazeDataset:
    """Stereo-pair gaze dataset over per-subject HDF5 archives.

    Each archive holds ``face_patch (N,H,W,3) uint8``, ``face_gaze (N,2)``,
    ``face_head_pose (N,2)`` with rows frame-major over 18 cameras.

    Samples are dicts (same keys as /root/reference/dataset/gaze.py:125-142):
    ``{img_0, gt_gaze, head_pose_0, idx_0[, img_1, gt_gaze_1, head_pose_1,
    idx_1]}`` with ``img_*`` raw uint8 RGB HWC.
    """

    def __init__(
        self,
        dataset_name: str,
        dataset_path: str,
        color_type: str,
        keys_to_use: Sequence[str],
        camera_tag: str = "all",
        stereo: bool = True,
        seed: int = 0,
        pairing: str = "reference",
        pair_rng=None,
        pair_index: "PairIndex" = None,
    ) -> None:
        """``pairing`` selects the stereo pair-index mode:

        - ``"reference"`` (default): bit-exact reproduction of the
          reference's frozen pairing (stdlib Mersenne-Twister ``choice``,
          /root/reference/dataset/gaze.py:72). Pass a shared ``pair_rng``
          (``random.Random``) to replay the reference's train-then-test
          construction order across two datasets (main.py:216,224).
        - ``"rng"``: dedicated ``np.random.Generator(seed)`` — same
          distribution, independent of stdlib ``random`` consumers.

        ``pair_index`` overrides both with a precomputed index.
        """
        if h5py is None:  # pragma: no cover
            raise ImportError("h5py is required for GazeDataset")
        assert dataset_name in ("xgaze", "mpiinv"), dataset_name
        assert color_type in ("rgb", "bgr"), color_type
        self.dataset_name = dataset_name
        self.color_type = color_type
        self.camera_tag = camera_tag
        self.stereo = stereo
        self.file_paths = [os.path.join(dataset_path, k) for k in keys_to_use]
        assert self.file_paths, "keys_to_use must be non-empty"

        sizes = []
        for p in self.file_paths:
            with h5py.File(p, "r", swmr=True) as f:
                sizes.append(f["face_patch"].shape[0])
        self.file_sizes = sizes
        self.idx_to_kv = resolve_pair_index(
            sizes, camera_tag, pairing=pairing, pair_rng=pair_rng,
            seed=seed, pair_index=pair_index,
        )

        # Lazy per-thread archive handles (SWMR lets concurrent readers share
        # the files, mirroring /root/reference/dataset/gaze.py:54-56,99-103).
        self._local = threading.local()
        # every thread's handles keyed by owning thread, for close() AND for
        # pruning: threading.local hides other threads' attributes from the
        # closing thread, and loaders build a FRESH thread pool per epoch —
        # without pruning, every epoch would leak num_threads x num_files
        # open descriptors from the previous epoch's dead workers until the
        # process hits its fd limit.
        self._open_handles: List[tuple] = []  # (thread, [h5py.File, ...])
        self._handles_lock = threading.Lock()
        # bumped by close(); stale threads whose handles were closed reopen
        # on their next access instead of erroring on a closed file
        self._generation = 0

    def _archives(self) -> List["h5py.File"]:
        if getattr(self._local, "generation", -1) != self._generation:
            # Open AND register under _handles_lock: opening outside let a
            # close() that started between the generation check and the
            # registration leave this thread holding pre-close handles that
            # no future close() could see. Opens happen only on generation
            # change, so lock contention here is negligible.
            with self._handles_lock:
                # prune dead threads' registrations first (a dead thread
                # cannot be mid-read, so closing its handles is safe); this
                # bounds the registry at the number of LIVE reader threads
                dead = [e for e in self._open_handles if not e[0].is_alive()]
                if dead:
                    self._open_handles = [
                        e for e in self._open_handles if e[0].is_alive()
                    ]
                handles = [
                    h5py.File(p, "r", swmr=True) for p in self.file_paths
                ]
                gen = self._generation
                self._open_handles.append((threading.current_thread(), handles))
            for _t, hs in dead:
                for f in hs:
                    try:
                        f.close()
                    except Exception:
                        pass
            self._local.archives = handles
            self._local.generation = gen
        return self._local.archives

    def __len__(self) -> int:
        return len(self.idx_to_kv)

    def _read_view(self, hdf: "h5py.File", idx: int) -> Dict[str, Any]:
        image = np.asarray(hdf["face_patch"][idx])
        if self.color_type == "bgr":
            image = image[..., ::-1]  # BGR->RGB channel reversal
        gaze = np.asarray(hdf["face_gaze"][idx], dtype=np.float64)
        head_pose = np.asarray(hdf["face_head_pose"][idx], dtype=np.float64)
        if self.dataset_name == "mpiinv":
            head_pose = head_pose.copy()
            head_pose[0] *= -1  # MPII-NV pitch sign convention
        return {"img": image, "gaze": gaze, "head_pose": head_pose}

    def __getitem__(self, index: int) -> Dict[str, Any]:
        key, idx, idx_b = self.idx_to_kv[index]
        hdf = self._archives()[key]
        v0 = self._read_view(hdf, idx)
        data: Dict[str, Any] = {
            "img_0": v0["img"],
            "gt_gaze": v0["gaze"],
            "head_pose_0": v0["head_pose"],
            "idx_0": idx,
        }
        if self.stereo:
            v1 = self._read_view(hdf, idx_b)
            data.update(
                {
                    "img_1": v1["img"],
                    "gt_gaze_1": v1["gaze"],
                    "head_pose_1": v1["head_pose"],
                    "idx_1": idx_b,
                }
            )
        return data

    def close(self) -> None:
        """Close EVERY thread's lazily opened handles (reader threads park
        theirs in a shared registry; h5py file closes are thread-safe under
        its global lock).

        Loaders should be quiesced first: a reader thread caught MID-read
        still fails on its closed handle (unavoidable without per-read
        locking). A stale thread returning AFTER close() transparently
        reopens via the generation check in ``_archives`` rather than using
        a dead handle, so the dataset stays usable post-close.
        """
        with self._handles_lock:
            entries, self._open_handles = self._open_handles, []
            self._generation += 1
        for _t, handles in entries:
            for f in handles:
                try:
                    f.close()
                except Exception:
                    pass
        if hasattr(self._local, "archives"):
            del self._local.archives
