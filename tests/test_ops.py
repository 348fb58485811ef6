"""Pallas fusion-kernel tests (interpreter mode on CPU; same code compiles
with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.ops import fused_image_feat_fuser, rotate_concat_matmul_relu


def _inputs(b=128, d=256, v=128, h=512, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(b, d) * 0.1, dtype)
    feat = jnp.asarray(rng.randn(b, 3, v) * 0.1, dtype)
    hp = rng.uniform(-0.8, 0.8, (b, 2)).astype(np.float32)
    from rot_mvgaze_tpu.geometry import rotation_matrix_2d

    rot = rotation_matrix_2d(jnp.asarray(hp)).astype(dtype)
    w1 = jnp.asarray(rng.randn(d + 3 * v, h) * 0.02, dtype)
    b1 = jnp.asarray(rng.randn(h) * 0.01, jnp.float32)
    return img, feat, rot, w1, b1


def _xla_reference(img, feat, rot, w1, b1):
    rotated = jnp.einsum(
        "bij,bjv->biv", rot.astype(jnp.float32), feat.astype(jnp.float32)
    )
    x = jnp.concatenate([img, rotated.reshape(img.shape[0], -1).astype(img.dtype)], -1)
    return jax.nn.relu(
        jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    ).astype(img.dtype)


class TestRotateConcatMatmulRelu:
    def test_matches_xla(self):
        img, feat, rot, w1, b1 = _inputs()
        got = rotate_concat_matmul_relu(img, feat, rot, w1, b1)
        want = _xla_reference(img, feat, rot, w1, b1)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_multi_tile_grid(self):
        img, feat, rot, w1, b1 = _inputs(b=256, h=1024)
        got = rotate_concat_matmul_relu(img, feat, rot, w1, b1)
        want = _xla_reference(img, feat, rot, w1, b1)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_gradients_match_xla(self):
        img, feat, rot, w1, b1 = _inputs(b=128, d=128, v=128, h=512)

        def loss_pallas(args):
            return jnp.sum(rotate_concat_matmul_relu(*args) ** 2)

        def loss_xla(args):
            return jnp.sum(_xla_reference(*args) ** 2)

        args = (img, feat, rot, w1, b1)
        g_p = jax.grad(loss_pallas)(args)
        g_x = jax.grad(loss_xla)(args)
        for a, b, name in zip(g_p, g_x, ["img", "feat", "rot", "w1", "b1"]):
            np.testing.assert_allclose(
                a, b, atol=5e-4, rtol=1e-3, err_msg=f"grad {name}"
            )

    def test_jit(self):
        img, feat, rot, w1, b1 = _inputs()
        f = jax.jit(rotate_concat_matmul_relu)
        np.testing.assert_allclose(
            f(img, feat, rot, w1, b1),
            _xla_reference(img, feat, rot, w1, b1),
            atol=2e-5,
            rtol=1e-5,
        )


class TestFusedFuser:
    def test_full_fuser_with_batch_padding(self):
        """Non-tile batch (e.g. 50, the reference batch size) gets padded."""
        img, feat, rot, w1, b1 = _inputs(b=128)
        img, feat, rot = img[:50], feat[:50], rot[:50]
        rng = np.random.RandomState(1)
        h_dim = w1.shape[1]
        w2 = jnp.asarray(rng.randn(h_dim, 3 * 128) * 0.02, jnp.float32)
        b2 = jnp.asarray(rng.randn(3 * 128) * 0.01, jnp.float32)
        got = fused_image_feat_fuser(img, feat, rot, w1, b1, w2, b2)
        want = _xla_reference(img, feat, rot, w1, b1) @ w2 + b2
        assert got.shape == (50, 3 * 128)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


class TestMaxPoolCandidateTree:
    """ops/pooling.py — utility kept despite the negative perf result."""

    def test_forward_exact_and_grad_parity(self):
        import flax.linen as nn

        from rot_mvgaze_tpu.ops.pooling import max_pool_3x3s2p1

        rng = np.random.default_rng(0)
        for shape in [(2, 16, 16, 4), (1, 13, 15, 3)]:
            x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            ref = nn.max_pool(
                x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )
            out = max_pool_3x3s2p1(x)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
            g_ref = jax.grad(
                lambda x: jnp.sum(
                    nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)]) ** 2
                )
            )(x)
            g = jax.grad(lambda x: jnp.sum(max_pool_3x3s2p1(x) ** 2))(x)
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(g_ref), atol=1e-6
            )


def test_rotate_concat_grad_with_bf16_bias():
    """The b1 cotangent must match the primal dtype (custom_vjp rejects a
    mismatch at trace time; the bwd rule used to hard-code float32)."""
    img, feat, rot, w1, b1 = _inputs(b=128, d=128, v=128, h=256)
    b1 = b1.astype(jnp.bfloat16)

    def loss(b1):
        return jnp.sum(rotate_concat_matmul_relu(img, feat, rot, w1, b1))

    g = jax.grad(loss)(b1)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_rotate_concat_grad_mixed_bf16_activations_f32_weights():
    """bf16 activations with f32 weights is a legal call the forward kernel
    accepts; the dimg cotangent must be cast back to the bf16 primal dtype
    or custom_vjp rejects it at trace time (r4 review batch 5)."""
    img, feat, rot, w1, b1 = _inputs(b=128, d=128, v=128, h=256)
    img = img.astype(jnp.bfloat16)
    feat = feat.astype(jnp.bfloat16)

    def loss(img, feat):
        return jnp.sum(
            rotate_concat_matmul_relu(img, feat, rot, w1, b1).astype(
                jnp.float32
            )
        )

    gi, gf = jax.grad(loss, argnums=(0, 1))(img, feat)
    assert gi.dtype == jnp.bfloat16
    assert gf.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(gi, np.float32)).all()
