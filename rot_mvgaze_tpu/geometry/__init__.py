"""L0 gaze geometry: pitchyaw <-> 3D unit vectors, SO(3) head rotations,
angular error. Pure JAX (vmap/jit-native) plus float64 numpy eval-parity
versions.

Reference semantics: /root/reference/utils/math.py:26-219.
"""

from rot_mvgaze_tpu.geometry.gaze import (
    angular_error,
    angular_error_numpy,
    head_pose_to_rotation,
    pitchyaw_to_vector,
    pitchyaw_to_vector_numpy,
    rotation_matrix_2d,
    vector_to_pitchyaw,
    vector_to_pitchyaw_numpy,
)

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
