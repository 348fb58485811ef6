"""L1 data layer: HDF5-backed multi-view gaze datasets, stereo pair
indexing, camera splits, host-side batching with device prefetch.

Reference: /root/reference/dataset/gaze.py. TPU-first redesign: the host
loader returns RAW uint8 images (4x less host->device bandwidth than the
reference's float pipeline) and all augmentation/normalization runs on-device
inside the jitted train step (rot_mvgaze_tpu.augment).
"""

from rot_mvgaze_tpu.data.pairing import (
    CAMERA_TAGS,
    build_pair_index,
    build_pair_index_reference,
    reference_pair_indices,
)
from rot_mvgaze_tpu.data.hdf5 import GazeDataset
from rot_mvgaze_tpu.data.multiview import MultiViewGazeDataset
from rot_mvgaze_tpu.data.pipeline import BatchLoader, device_prefetch
from rot_mvgaze_tpu.data.synthetic import write_synthetic_h5

__all__ = [
    "CAMERA_TAGS",
    "build_pair_index",
    "build_pair_index_reference",
    "reference_pair_indices",
    "GazeDataset",
    "MultiViewGazeDataset",
    "BatchLoader",
    "device_prefetch",
    "write_synthetic_h5",
]
