"""Augmentation tests: exact eval-path parity (vs torchvision semantics
computed by hand) and distributional checks for the stochastic train path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    color_jitter,
    normalize,
    random_affine,
    eval_preprocess,
    random_multi_erasing,
    train_preprocess,
)


def _u8(shape=(2, 32, 32, 3), seed=0):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


class TestEvalPath:
    def test_exact_semantics(self):
        """test_preprocess == (x/255 - mean)/std for same-size input — the
        deterministic stack of /root/reference/main.py:51-56."""
        img = _u8()
        out = np.asarray(eval_preprocess(jnp.asarray(img), 32))
        expected = (img.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / (
            np.asarray(IMAGENET_STD)
        )
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_resize_path(self):
        img = _u8((1, 64, 64, 3))
        out = eval_preprocess(jnp.asarray(img), 32)
        assert out.shape == (1, 32, 32, 3)


class TestColorJitter:
    def test_identity_ranges(self):
        img = jnp.asarray(_u8((8, 8, 3))[..., :]) / 255.0
        img = img.reshape(8, 8, 3)
        out = color_jitter(
            jax.random.PRNGKey(0), img, brightness=0.0, contrast=0.0, saturation=0.0
        )
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_output_range(self):
        img = jnp.asarray(_u8((16, 16, 3)).astype(np.float32) / 255.0)
        for s in range(5):
            out = color_jitter(jax.random.PRNGKey(s), img)
            assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_brightness_only_scales(self):
        img = jnp.full((4, 4, 3), 0.25)
        out = color_jitter(
            jax.random.PRNGKey(1), img, brightness=1.0, contrast=0.0, saturation=0.0
        )
        ratio = np.asarray(out) / 0.25
        assert np.allclose(ratio, ratio.flat[0], atol=1e-5)  # uniform scale


class TestRandomAffine:
    def test_identity_when_no_jitter(self):
        img = jnp.asarray(_u8((16, 16, 3)).astype(np.float32))
        out = random_affine(
            jax.random.PRNGKey(0), img, scale_range=(1.0, 1.0), translate=(0.0, 0.0)
        )
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_translation_moves_content(self):
        img = np.zeros((16, 16, 1), np.float32)
        img[8, 8, 0] = 1.0
        moved = 0
        for s in range(10):
            out = np.asarray(
                random_affine(
                    jax.random.PRNGKey(s),
                    jnp.asarray(img),
                    scale_range=(1.0, 1.0),
                    translate=(0.3, 0.3),
                )
            )
            pos = np.unravel_index(out.argmax(), out.shape)
            if pos[:2] != (8, 8):
                moved += 1
        assert moved > 0

    def test_fill_zero_outside(self):
        img = jnp.ones((16, 16, 1), jnp.float32)
        out = np.asarray(
            random_affine(
                jax.random.PRNGKey(0),
                img,
                scale_range=(2.0, 2.0),  # zoom in: no out-of-bounds -> all ones
                translate=(0.0, 0.0),
            )
        )
        assert out.min() == 1.0
        out2 = np.asarray(
            random_affine(
                jax.random.PRNGKey(0),
                img,
                scale_range=(0.5, 0.5),  # zoom out: borders filled with 0
                translate=(0.0, 0.0),
            )
        )
        assert out2[0, 0, 0] == 0.0 and out2[8, 8, 0] == 1.0


class TestMultiErasing:
    def test_p_zero_is_identity(self):
        img = jnp.ones((32, 32, 3))
        out = random_multi_erasing(jax.random.PRNGKey(0), img, p=0.0)
        np.testing.assert_array_equal(out, img)

    def test_p_one_erases_expected_fraction(self):
        img = jnp.ones((64, 64, 1))
        fracs = []
        for s in range(20):
            out = np.asarray(
                random_multi_erasing(jax.random.PRNGKey(s), img, p=1.0)
            )
            fracs.append(1.0 - out.mean())
        # proportion ~ U[0.5, 0.6] -> average erased fraction near 0.55
        assert 0.4 < np.mean(fracs) < 0.7

    def test_blocky_structure(self):
        """Erased cells are contiguous blocks (nearest upsample), not salt."""
        img = jnp.ones((60, 60, 1))
        out = np.asarray(
            random_multi_erasing(
                jax.random.PRNGKey(3), img, p=1.0, dot_size=(0.2, 0.2)
            )
        )[..., 0]
        # hs=5 -> 12x12 pixel cells; every cell must be constant
        for cy in range(5):
            for cx in range(5):
                cell = out[cy * 12 : (cy + 1) * 12, cx * 12 : (cx + 1) * 12]
                assert cell.min() == cell.max()


class TestTrainPipeline:
    def test_shapes_dtype_and_determinism(self):
        img = jnp.asarray(_u8((4, 32, 32, 3)))
        k = jax.random.PRNGKey(0)
        out1 = train_preprocess(k, img, 32)
        out2 = train_preprocess(k, img, 32)
        assert out1.shape == (4, 32, 32, 3)
        assert out1.dtype == jnp.float32
        np.testing.assert_array_equal(out1, out2)  # same key -> same aug
        out3 = train_preprocess(jax.random.PRNGKey(1), img, 32)
        assert not np.allclose(out1, out3)  # different key -> different aug

    def test_per_sample_independent_keys(self):
        img = jnp.asarray(np.tile(_u8((1, 32, 32, 3)), (4, 1, 1, 1)))
        out = np.asarray(train_preprocess(jax.random.PRNGKey(0), img, 32))
        # identical inputs must get different augmentations per sample
        assert not np.allclose(out[0], out[1])


def test_multi_erasing_tiny_dot_size_clamps_to_grid():
    """dot_size below 1/_MAX_ERASE_GRID must clamp to the finest grid, not
    silently erase the whole image (out-of-range cell indices match no
    one-hot column -> mask 0)."""
    import jax

    from rot_mvgaze_tpu.augment.ops import random_multi_erasing

    img = jnp.ones((32, 32, 3), jnp.float32)
    out = random_multi_erasing(
        jax.random.PRNGKey(0), img, p=1.0, dot_size=(0.01, 0.02),
        proportion=(0.1, 0.1),
    )
    # with keep-probability 0.9 most pixels must survive
    assert float(jnp.mean(out)) > 0.5
