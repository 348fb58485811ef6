"""Per-pair gaze losses (L1 / L2 / angular) as pure JAX functions.

Parity with /root/reference/losses/gaze_loss.py:9-64. The angular loss is
``acos(clip(cos_sim, -1, 1)) * 180/pi`` over 3D unit vectors derived from
pitchyaw — the reference's ``hardtanh`` clamp (:44) is ``jnp.clip`` here.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from rot_mvgaze_tpu.geometry import pitchyaw_to_vector

_RAD2DEG = 180.0 / np.pi


def _cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    # torch F.cosine_similarity clamps each norm at eps (denominator
    # max(||a||,eps)*max(||b||,eps)), /root/reference/losses/gaze_loss.py:43.
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return dot / (na * nb)


_SIM_EPS = 1e-6


def gaze_angular_loss(y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean angular distance in degrees between pitchyaw predictions.

    Parity: /root/reference/losses/gaze_loss.py:42-52 (note the reference
    passes ``(y, y_hat)`` into the symmetric distance; order is irrelevant).

    Stability deviation: the similarity is clamped to ``[-1+eps, 1-eps]``
    rather than the reference's hard [-1, 1] (hardtanh, :44). At the exact
    boundary ``d/dx arccos(x)`` is infinite, so a prediction that matches its
    label to fp precision produces NaN gradients — a latent bug in the
    reference that becomes likely under bfloat16. The clamp biases the loss
    by at most ``arccos(1-eps)`` = 0.08 degrees and only at zero error.
    """
    va = pitchyaw_to_vector(y)
    vb = pitchyaw_to_vector(y_hat)
    sim = jnp.clip(_cosine_similarity(va, vb), -1.0 + _SIM_EPS, 1.0 - _SIM_EPS)
    return jnp.mean(jnp.arccos(sim) * _RAD2DEG)


def gaze_l2_loss(y: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over pitchyaw (/root/reference/losses/gaze_loss.py:56-59
    computes abs-then-square; square(d) is identical and one pass cheaper)."""
    return jnp.mean(jnp.square(y - y_hat))


def gaze_l1_loss(y: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error over pitchyaw (/root/reference/losses/gaze_loss.py:61-64)."""
    return jnp.mean(jnp.abs(y - y_hat))


def make_gaze_loss(loss_type: str) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Factory matching GazeLoss's loss_type switch
    (/root/reference/losses/gaze_loss.py:21-36)."""
    if loss_type == "l1":
        return gaze_l1_loss
    if loss_type == "l2":
        return gaze_l2_loss
    if loss_type == "angular":
        return gaze_angular_loss
    raise ValueError(f"unknown loss type {loss_type!r}")
