"""Gaze geometry primitives.

The reference implements each primitive twice (numpy / torch) with explicit
batch loops over rows (/root/reference/utils/math.py:42-137,188-219). Here the
JAX versions are written once over the trailing axis so they compose with
``vmap``/``jit``/``grad`` and broadcast over arbitrary leading batch dims; the
numpy versions are kept for the float64 host-side eval metric, which is the
parity target (/root/reference/trainer.py:192).

Conventions (identical to the reference):
- ``pitchyaw = (pitch, yaw)``; gaze vector
  ``v = (cos(p)·sin(y), sin(p), cos(p)·cos(y))``
  (/root/reference/utils/math.py:42-50).
- Head-pose rotation ``R = Ry(yaw) @ Rx(-pitch)`` — the pitch sign flip is
  part of the head-pose definition (/root/reference/utils/math.py:199-216).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "pitchyaw_to_vector",
    "pitchyaw_to_vector_numpy",
    "vector_to_pitchyaw",
    "vector_to_pitchyaw_numpy",
    "angular_error",
    "angular_error_numpy",
    "rotation_matrix_2d",
    "head_pose_to_rotation",
]

_RAD2DEG = 180.0 / np.pi


def pitchyaw_to_vector(pitchyaws: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) pitchyaw angles -> (..., 3) unit gaze vectors.

    Matches /root/reference/utils/math.py:42-60 (numpy & torch twins).
    """
    pitch = pitchyaws[..., 0]
    yaw = pitchyaws[..., 1]
    cos_p = jnp.cos(pitch)
    return jnp.stack(
        [cos_p * jnp.sin(yaw), jnp.sin(pitch), cos_p * jnp.cos(yaw)], axis=-1
    )


def vector_to_pitchyaw(vectors: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) gaze vectors -> (..., 2) pitchyaw angles.

    Matches /root/reference/utils/math.py:78-92.
    """
    norm = jnp.linalg.norm(vectors, axis=-1, keepdims=True)
    v = vectors / jnp.maximum(norm, 1e-12)
    pitch = jnp.arcsin(jnp.clip(v[..., 1], -1.0, 1.0))
    yaw = jnp.arctan2(v[..., 0], v[..., 2])
    return jnp.stack([pitch, yaw], axis=-1)


def angular_error(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angular error in degrees between gaze directions.

    Inputs may be (..., 2) pitchyaw or (..., 3) vectors, like the reference
    dispatcher (/root/reference/utils/math.py:105-137). The cosine similarity
    is clamped to [-1, 1] before ``arccos`` (the reference torch path does the
    same via ``hardtanh``, /root/reference/losses/gaze_loss.py:42-45).
    """
    if a.shape[-1] == 2:
        a = pitchyaw_to_vector(a)
    if b.shape[-1] == 2:
        b = pitchyaw_to_vector(b)
    ab = jnp.sum(a * b, axis=-1)
    a_norm = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-7)
    b_norm = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-7)
    sim = jnp.clip(ab / (a_norm * b_norm), -1.0, 1.0)
    return jnp.arccos(sim) * _RAD2DEG


def rotation_matrix_2d(pitch_yaw: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Head-pose pitchyaw (..., 2) -> SO(3) rotation matrices (..., 3, 3).

    ``R = Ry(yaw) @ Rx(-pitch)`` with ``inverse=True`` transposing
    (label -> canonical), matching /root/reference/utils/math.py:188-219
    including the ``pitch * -1`` sign convention at :199.
    """
    pitch = -pitch_yaw[..., 0]
    yaw = pitch_yaw[..., 1]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(cp)
    # Closed form of Ry(yaw) @ Rx(pitch'): elementwise, full precision — no
    # tiny 3x3 matmuls (which would fall to reduced-precision dots on TPU).
    mats = jnp.stack(
        [cy, sy * sp, sy * cp,
         zeros, cp, -sp,
         -sy, cy * sp, cy * cp],
        axis=-1,
    ).reshape(*pitch.shape, 3, 3)
    if inverse:
        mats = jnp.swapaxes(mats, -1, -2)
    return mats


# ``head_pose_to_rotation`` is the descriptive name used across this package;
# ``rotation_matrix_2d`` is kept as the reference-compatible alias.
head_pose_to_rotation = rotation_matrix_2d


# ---------------------------------------------------------------------------
# float64 numpy versions — the host-side eval metric path. The reference
# computes its headline number with float64 numpy on host
# (/root/reference/trainer.py:169-192); keep the exact same math here.
# ---------------------------------------------------------------------------


def pitchyaw_to_vector_numpy(pitchyaws: np.ndarray) -> np.ndarray:
    """float64 numpy twin of :func:`pitchyaw_to_vector`."""
    pitchyaws = np.asarray(pitchyaws, dtype=np.float64)
    sin = np.sin(pitchyaws)
    cos = np.cos(pitchyaws)
    out = np.empty((*pitchyaws.shape[:-1], 3), dtype=np.float64)
    out[..., 0] = cos[..., 0] * sin[..., 1]
    out[..., 1] = sin[..., 0]
    out[..., 2] = cos[..., 0] * cos[..., 1]
    return out


def vector_to_pitchyaw_numpy(vectors: np.ndarray) -> np.ndarray:
    """float64 numpy twin of :func:`vector_to_pitchyaw`."""
    vectors = np.asarray(vectors, dtype=np.float64)
    norm = np.linalg.norm(vectors, axis=-1, keepdims=True)
    v = vectors / np.maximum(norm, 1e-12)
    out = np.empty((*vectors.shape[:-1], 2), dtype=np.float64)
    out[..., 0] = np.arcsin(np.clip(v[..., 1], -1.0, 1.0))
    out[..., 1] = np.arctan2(v[..., 0], v[..., 2])
    return out


def angular_error_numpy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """float64 per-sample angular error in degrees.

    Exact eval-metric math of /root/reference/utils/math.py:105-120 (norms
    clipped at 1e-7), with the cosine similarity additionally clamped to
    [-1, 1] so fp round-off at 0° cannot produce NaN.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape[-1] == 2:
        a = pitchyaw_to_vector_numpy(a)
    if b.shape[-1] == 2:
        b = pitchyaw_to_vector_numpy(b)
    ab = np.sum(a * b, axis=-1)
    a_norm = np.clip(np.linalg.norm(a, axis=-1), 1e-7, None)
    b_norm = np.clip(np.linalg.norm(b, axis=-1), 1e-7, None)
    sim = np.clip(ab / (a_norm * b_norm), -1.0, 1.0)
    return np.arccos(sim) * 180.0 / np.pi
