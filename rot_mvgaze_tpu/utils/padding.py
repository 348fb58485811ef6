"""Row padding for static-shape executables.

Jitted steps compile per input shape, so ragged final batches must be padded
up to a fixed row count (repeating the last row; padded predictions are
trimmed by the caller). One implementation shared by Trainer.test,
evaluate.evaluate_gaze, and serving.GazePredictor.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def pad_rows(x: np.ndarray, target: int) -> np.ndarray:
    """Pad a (N>0, ...) array to ``target`` rows by repeating the last row."""
    x = np.asarray(x)
    pad = target - x.shape[0]
    if pad <= 0:
        return x
    if x.shape[0] == 0:
        # repeating the last row of nothing would silently return 0 rows
        # and hand a fixed-shape executable a degenerate batch downstream
        raise ValueError(
            f"cannot pad an empty array to {target} rows (empty per-host "
            f"shard? dataset smaller than the process count?)"
        )
    return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)


def iter_padded_microbatches(arrays, micro_batch: int):
    """Slice N-row arrays into fixed-size micro-batches, padding the last.

    Yields ``(padded_slices_tuple, real_rows)`` per micro-batch — the ONE
    implementation of the serving pad/trim protocol (GazePredictor and
    AotGazePredictor)."""
    n = int(np.asarray(arrays[0]).shape[0])
    for start in range(0, n, micro_batch):
        end = min(start + micro_batch, n)
        yield (
            tuple(
                pad_rows(np.asarray(a[start:end]), micro_batch)
                for a in arrays
            ),
            end - start,
        )


def pad_batch(batch: Dict[str, Any], target: int) -> Dict[str, Any]:
    """Pad every array-valued entry of a batch dict to ``target`` rows
    (non-arrays and scalars pass through)."""
    return {
        k: pad_rows(v, target) if getattr(v, "ndim", 0) > 0 else v
        for k, v in batch.items()
    }
