"""Property-based tests (hypothesis) for the geometry and pairing layers.

The golden tests in test_geometry.py / test_pairing_reference.py pin exact
values against the reference formulas (/root/reference/utils/math.py,
/root/reference/dataset/gaze.py:60-73); these tests instead assert the
algebraic INVARIANTS that must hold for every input — roundtrips, SO(3)
membership, metric axioms, cross-primitive consistency, and pair-index
structure — over randomized inputs, so a regression anywhere in the domain
(not just at the golden points) fails loudly.

All array properties are checked vectorized over a hypothesis-generated
batch per example (keeps jit/trace count at one per function, not one per
draw). Deadlines are disabled: the first call into jax compiles.
"""

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402
from hypothesis.extra import numpy as hnp  # noqa: E402

from rot_mvgaze_tpu.data.pairing import (  # noqa: E402
    CAMERA_TAGS,
    NUM_CAMERAS,
    build_pair_index,
    build_pair_index_reference,
    reference_pair_indices,
)
from rot_mvgaze_tpu.geometry import (  # noqa: E402
    angular_error,
    angular_error_numpy,
    pitchyaw_to_vector,
    pitchyaw_to_vector_numpy,
    rotation_matrix_2d,
    vector_to_pitchyaw,
    vector_to_pitchyaw_numpy,
)

# derandomize: a marginal tolerance must not flake only in someone else's
# run; failures reproduce bit-identically everywhere.
_SETTINGS = dict(max_examples=50, deadline=None, derandomize=True)

# Pitch away from the +-pi/2 poles (where yaw is undefined) and yaw inside
# the open (-pi, pi) atan2 branch; both with margin so roundtrip equality is
# well-conditioned. The gaze/head-pose domain in the data is far narrower.
_pitch = st.floats(-1.4, 1.4, allow_nan=False, allow_infinity=False)
_yaw = st.floats(-3.1, 3.1, allow_nan=False, allow_infinity=False)


def _pitchyaw_batch(draw, n):
    p = draw(hnp.arrays(np.float64, (n,), elements=_pitch))
    y = draw(hnp.arrays(np.float64, (n,), elements=_yaw))
    return np.stack([p, y], axis=-1)


@st.composite
def pitchyaw_batches(draw, max_n=16):
    n = draw(st.integers(1, max_n))
    return _pitchyaw_batch(draw, n)


@st.composite
def pitchyaw_batch_pairs(draw, max_n=16):
    n = draw(st.integers(1, max_n))
    return _pitchyaw_batch(draw, n), _pitchyaw_batch(draw, n)


class TestPitchyawVectorRoundtrip:
    @given(pitchyaw_batches())
    @settings(**_SETTINGS)
    def test_numpy_roundtrip(self, py):
        v = pitchyaw_to_vector_numpy(py)
        np.testing.assert_allclose(
            np.linalg.norm(v, axis=-1), 1.0, atol=1e-12
        )
        np.testing.assert_allclose(
            vector_to_pitchyaw_numpy(v), py, atol=1e-9
        )

    @given(pitchyaw_batches())
    @settings(**_SETTINGS)
    def test_jax_roundtrip_and_twin_agreement(self, py):
        v = np.asarray(pitchyaw_to_vector(py.astype(np.float32)))
        np.testing.assert_allclose(
            v, pitchyaw_to_vector_numpy(py), atol=1e-6
        )
        back = np.asarray(vector_to_pitchyaw(v))
        np.testing.assert_allclose(back, py, atol=1e-5)

    @given(pitchyaw_batches(), st.floats(0.05, 50.0))
    @settings(**_SETTINGS)
    def test_vector_to_pitchyaw_scale_invariant(self, py, scale):
        v = pitchyaw_to_vector_numpy(py)
        np.testing.assert_allclose(
            vector_to_pitchyaw_numpy(v * scale),
            vector_to_pitchyaw_numpy(v),
            atol=1e-9,
        )


class TestAngularErrorAxioms:
    @given(pitchyaw_batch_pairs())
    @settings(**_SETTINGS)
    def test_range_symmetry_identity(self, pys):
        a, b = pys
        err = angular_error_numpy(a, b)
        assert np.all(err >= 0.0) and np.all(err <= 180.0)
        np.testing.assert_allclose(err, angular_error_numpy(b, a), atol=1e-10)
        np.testing.assert_allclose(angular_error_numpy(a, a), 0.0, atol=1e-5)

    @given(pitchyaw_batch_pairs())
    @settings(**_SETTINGS)
    def test_pitchyaw_and_vector_forms_agree(self, pys):
        a, b = pys
        va = pitchyaw_to_vector_numpy(a)
        vb = pitchyaw_to_vector_numpy(b)
        np.testing.assert_allclose(
            angular_error_numpy(va, vb), angular_error_numpy(a, b), atol=1e-9
        )

    @given(pitchyaw_batch_pairs())
    @settings(**_SETTINGS)
    def test_jax_numpy_twins_agree(self, pys):
        a, b = pys
        jax_err = np.asarray(
            angular_error(a.astype(np.float32), b.astype(np.float32))
        )
        # f32 forward vs f64 twin: arccos amplifies a k-ulp f32 error in the
        # cosine to ~sqrt(2*k*eps) radians near 0/180 deg (~0.1 deg for a few
        # ulps), so the tolerance is set for the conditioning, not the ulps.
        # Sign/axis regressions produce O(degrees-to-180) errors regardless.
        np.testing.assert_allclose(
            jax_err, angular_error_numpy(a, b), atol=0.25
        )

    @given(pitchyaw_batch_pairs(), st.floats(0.05, 20.0))
    @settings(**_SETTINGS)
    def test_scale_invariance(self, pys, scale):
        a, b = pys
        va = pitchyaw_to_vector_numpy(a)
        vb = pitchyaw_to_vector_numpy(b)
        np.testing.assert_allclose(
            angular_error_numpy(va, vb * scale),
            angular_error_numpy(va, vb),
            atol=1e-8,
        )


class TestRotationMatrixProperties:
    @given(pitchyaw_batches())
    @settings(**_SETTINGS)
    def test_so3_membership(self, pose):
        R = np.asarray(rotation_matrix_2d(pose), np.float64)
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(
            np.einsum("...ij,...kj->...ik", R, R), eye, atol=1e-6
        )
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)

    @given(pitchyaw_batches())
    @settings(**_SETTINGS)
    def test_inverse_is_transpose(self, pose):
        R = np.asarray(rotation_matrix_2d(pose))
        Rinv = np.asarray(rotation_matrix_2d(pose, inverse=True))
        np.testing.assert_allclose(Rinv, np.swapaxes(R, -1, -2), atol=0)

    @given(pitchyaw_batches())
    @settings(**_SETTINGS)
    def test_rotates_z_axis_to_gaze_vector(self, pose):
        """Cross-primitive consistency: the head-pose rotation applied to
        the canonical +z axis IS the pitchyaw gaze vector of the same
        angles — R(p,y) @ [0,0,1] = (cos p sin y, sin p, cos p cos y).
        This ties rotation_matrix_2d's sign convention (pitch * -1,
        /root/reference/utils/math.py:199) to pitchyaw_to_vector's; a sign
        regression in either breaks it."""
        R = np.asarray(rotation_matrix_2d(pose), np.float64)
        np.testing.assert_allclose(
            R[..., :, 2], pitchyaw_to_vector_numpy(pose), atol=1e-6
        )


# ---------------------------------------------------------------------------
# Pair-index structure
# ---------------------------------------------------------------------------

_file_sizes = st.lists(st.integers(0, 5 * NUM_CAMERAS + 7), min_size=1, max_size=3)
_tags = st.sampled_from(sorted(CAMERA_TAGS))
_modes = st.sampled_from(["rng", "reference"])


def _check_pair_invariants(index, file_sizes, tag):
    cameras = set(CAMERA_TAGS[tag])
    seen = set()
    for file_i, idx, partner in index:
        n = file_sizes[file_i]
        assert 0 <= idx < n and 0 <= partner < n
        assert partner != idx
        assert idx % NUM_CAMERAS in cameras
        assert partner % NUM_CAMERAS in cameras
        # same frame: the partner is another camera of the SAME capture
        assert partner // NUM_CAMERAS == idx // NUM_CAMERAS
        assert (file_i, idx) not in seen  # each valid row appears once
        seen.add((file_i, idx))
    # completeness: every in-split row of a frame with >=2 in-split cameras
    # (within the file bound) must be present exactly once
    expected = set()
    for file_i, n in enumerate(file_sizes):
        for idx in range(n):
            if idx % NUM_CAMERAS not in cameras:
                continue
            frame_start = (idx // NUM_CAMERAS) * NUM_CAMERAS
            mates = [
                j
                for j in range(frame_start, frame_start + NUM_CAMERAS)
                if j < n and j != idx and j % NUM_CAMERAS in cameras
            ]
            if mates:
                expected.add((file_i, idx))
    assert seen == expected


class TestPairIndexProperties:
    @given(_file_sizes, _tags, _modes, st.integers(0, 2**31 - 1))
    @settings(**_SETTINGS)
    def test_structure_and_completeness(self, sizes, tag, mode, seed):
        build = (
            build_pair_index if mode == "rng" else build_pair_index_reference
        )
        index = build(sizes, tag, seed=seed)
        _check_pair_invariants(index, sizes, tag)

    @given(_file_sizes, _tags, _modes, st.integers(0, 2**31 - 1))
    @settings(**_SETTINGS)
    def test_same_seed_is_deterministic(self, sizes, tag, mode, seed):
        build = (
            build_pair_index if mode == "rng" else build_pair_index_reference
        )
        assert build(sizes, tag, seed=seed) == build(sizes, tag, seed=seed)

    @given(_file_sizes, _file_sizes, st.integers(0, 2**31 - 1))
    @settings(**_SETTINGS)
    def test_reference_sequence_draw_order_dependency(
        self, train_sizes, test_sizes, seed
    ):
        """reference_pair_indices replays train THEN test off one generator:
        the test index must equal a standalone replay only when the train
        construction consumed zero draws — and both halves must always obey
        the structural invariants."""
        train, test = reference_pair_indices(
            train_sizes, "novel_train", test_sizes, "novel_test", seed=seed
        )
        _check_pair_invariants(train, train_sizes, "novel_train")
        _check_pair_invariants(test, test_sizes, "novel_test")
        if not train:
            assert test == build_pair_index_reference(
                test_sizes, "novel_test", seed=seed
            )
