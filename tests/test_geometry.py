"""Golden-value tests for L0 geometry.

Golden numbers were produced by executing the reference implementations
(/root/reference/utils/math.py) on fixed inputs; only the numeric outputs are
embedded here. These pin down the sign conventions the whole model depends on
(pitch flip in rotation_matrix_2d, Ry@Rx composition order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.geometry import (
    angular_error,
    angular_error_numpy,
    pitchyaw_to_vector,
    pitchyaw_to_vector_numpy,
    rotation_matrix_2d,
    vector_to_pitchyaw,
    vector_to_pitchyaw_numpy,
)

PITCHYAW = np.array([[0.3, -0.5], [-1.1, 0.9], [0.0, 0.0], [1.2, 2.8]])

# reference pitchyaw_to_vector_numpy(PITCHYAW)
GOLDEN_VEC = np.array(
    [
        [-0.45801271084729195, 0.29552020666133955, 0.8383866435942036],
        [0.3553140480153102, -0.8912073600614354, 0.2819598706470495],
        [0.0, 0.0, 1.0],
        [0.12138555386678854, 0.9320390859672263, -0.34142157158245034],
    ]
)

# reference angular_error_numpy([[0.1,0.2],[0.5,-0.4]], [[0.15,0.1],[-0.2,0.3]])
GOLDEN_ANG = np.array([6.3653228067833085, 55.76521123322542])

# reference rotation_matrix_2d(torch.tensor([[0.2,-0.3],[-0.7,1.1]]))
GOLDEN_ROT = np.array(
    [
        [
            [0.9553365, 0.058710802, -0.2896295],
            [0.0, 0.9800666, 0.19866933],
            [0.29552022, -0.18979606, 0.9362934],
        ],
        [
            [0.45359612, 0.57413155, 0.68163306],
            [0.0, 0.7648422, -0.64421767],
            [-0.8912074, 0.29221463, 0.34692946],
        ],
    ],
    dtype=np.float32,
)


class TestPitchyawToVector:
    def test_golden_jax(self):
        out = pitchyaw_to_vector(jnp.asarray(PITCHYAW, dtype=jnp.float32))
        np.testing.assert_allclose(out, GOLDEN_VEC, atol=1e-6)

    def test_golden_numpy_float64(self):
        out = pitchyaw_to_vector_numpy(PITCHYAW)
        np.testing.assert_allclose(out, GOLDEN_VEC, atol=1e-15)
        assert out.dtype == np.float64

    def test_unit_norm(self):
        out = pitchyaw_to_vector(jnp.asarray(PITCHYAW))
        np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1), 1.0, atol=1e-6)

    def test_batch_dims(self):
        batched = jnp.asarray(PITCHYAW).reshape(2, 2, 2)
        out = pitchyaw_to_vector(batched)
        assert out.shape == (2, 2, 3)
        np.testing.assert_allclose(out.reshape(4, 3), GOLDEN_VEC, atol=1e-6)


class TestVectorToPitchyaw:
    def test_roundtrip_jax(self):
        back = vector_to_pitchyaw(pitchyaw_to_vector(jnp.asarray(PITCHYAW)))
        np.testing.assert_allclose(back, PITCHYAW, atol=1e-6)

    def test_roundtrip_numpy(self):
        back = vector_to_pitchyaw_numpy(pitchyaw_to_vector_numpy(PITCHYAW))
        np.testing.assert_allclose(back, PITCHYAW, atol=1e-12)

    def test_unnormalized_input(self):
        v = pitchyaw_to_vector(jnp.asarray(PITCHYAW)) * 3.7
        np.testing.assert_allclose(vector_to_pitchyaw(v), PITCHYAW, atol=1e-6)


class TestAngularError:
    A = np.array([[0.1, 0.2], [0.5, -0.4]])
    B = np.array([[0.15, 0.1], [-0.2, 0.3]])

    def test_golden_numpy(self):
        np.testing.assert_allclose(angular_error_numpy(self.A, self.B), GOLDEN_ANG, atol=1e-12)

    def test_golden_jax(self):
        out = angular_error(jnp.asarray(self.A, jnp.float32), jnp.asarray(self.B, jnp.float32))
        np.testing.assert_allclose(out, GOLDEN_ANG, atol=1e-4)

    def test_identical_is_zero(self):
        out = angular_error(jnp.asarray(self.A), jnp.asarray(self.A))
        np.testing.assert_allclose(out, 0.0, atol=1e-3)
        assert not np.any(np.isnan(out))

    def test_vector_inputs(self):
        va = pitchyaw_to_vector_numpy(self.A)
        vb = pitchyaw_to_vector_numpy(self.B)
        np.testing.assert_allclose(angular_error_numpy(va, vb), GOLDEN_ANG, atol=1e-12)

    def test_grad_finite_at_zero(self):
        # The training loss differentiates through arccos; clamping must keep
        # the gradient finite for non-identical directions.
        def loss(a):
            return jnp.mean(angular_error(a, jnp.asarray(self.B, jnp.float32)))

        g = jax.grad(loss)(jnp.asarray(self.A, jnp.float32))
        assert np.all(np.isfinite(g))


class TestRotationMatrix:
    HP = np.array([[0.2, -0.3], [-0.7, 1.1]], dtype=np.float32)

    def test_golden(self):
        out = rotation_matrix_2d(jnp.asarray(self.HP))
        np.testing.assert_allclose(out, GOLDEN_ROT, atol=1e-6)

    def test_inverse_is_transpose(self):
        fwd = rotation_matrix_2d(jnp.asarray(self.HP))
        inv = rotation_matrix_2d(jnp.asarray(self.HP), inverse=True)
        np.testing.assert_allclose(inv, np.swapaxes(np.asarray(fwd), -1, -2), atol=1e-7)

    def test_orthonormal(self):
        r = np.asarray(rotation_matrix_2d(jnp.asarray(self.HP)))
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), r.shape)
        np.testing.assert_allclose(r @ np.swapaxes(r, -1, -2), eye, atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)

    def test_jit_and_vmap(self):
        hp = jnp.asarray(self.HP)
        jit_out = jax.jit(rotation_matrix_2d)(hp)
        vmap_out = jax.vmap(lambda x: rotation_matrix_2d(x[None])[0])(hp)
        np.testing.assert_allclose(jit_out, GOLDEN_ROT, atol=1e-6)
        np.testing.assert_allclose(vmap_out, GOLDEN_ROT, atol=1e-6)


def test_eight_virtual_devices():
    assert jax.device_count() == 8
