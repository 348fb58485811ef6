"""Property-based tests (hypothesis) for the augmentation layer.

test_augment.py / test_augment_distributions.py pin exact eval-path values
and KS-match the train-time distributions against the reference oracle;
these tests assert per-op structural invariants over randomized images and
PRNG keys:

- to_float/normalize closed forms and the affine invertibility of
  normalize;
- color_jitter stays in [0,1] and degenerates to the identity at zero
  strength for EVERY key;
- random_affine is the identity at (scale=1, translate=0), and in general
  every output pixel is SOME input pixel of the same channel or the zero
  fill (nearest resample never interpolates — the one-hot selection
  matmuls of ops.py:127-162 must select, not blend);
- random_multi_erasing multiplies by a {0,1} mask: every output pixel is
  the input pixel or zero, exactly the reference's mask-multiply semantics
  (/root/reference/utils/augment.py:16-47); p=0 never erases.

Fixed 8x8x3 shapes keep each op to one trace; derandomized for
bit-identical reproduction everywhere.
"""

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402
from hypothesis.extra import numpy as hnp  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rot_mvgaze_tpu.augment.ops import (  # noqa: E402
    IMAGENET_MEAN,
    IMAGENET_STD,
    color_jitter,
    normalize,
    random_affine,
    random_multi_erasing,
    to_float,
)

_SETTINGS = dict(max_examples=40, deadline=None, derandomize=True)

_H = _W = 8
_u8_images = hnp.arrays(
    np.uint8, (_H, _W, 3), elements=st.integers(0, 255)
)
_seeds = st.integers(0, 2**31 - 1)


def _unit_image(img_u8):
    return np.asarray(to_float(jnp.asarray(img_u8)))


class TestFloatAndNormalize:
    @given(_u8_images)
    @settings(**_SETTINGS)
    def test_to_float_closed_form(self, img_u8):
        out = _unit_image(img_u8)
        np.testing.assert_allclose(out, img_u8 / 255.0, atol=1e-7)
        assert out.min() >= 0.0 and out.max() <= 1.0

    @given(_u8_images)
    @settings(**_SETTINGS)
    def test_normalize_closed_form_and_inverse(self, img_u8):
        x = _unit_image(img_u8)
        y = np.asarray(normalize(jnp.asarray(x)))
        mean = np.asarray(IMAGENET_MEAN)
        std = np.asarray(IMAGENET_STD)
        np.testing.assert_allclose(y, (x - mean) / std, atol=1e-5)
        np.testing.assert_allclose(y * std + mean, x, atol=1e-5)


class TestColorJitterInvariants:
    @given(_u8_images, _seeds)
    @settings(**_SETTINGS)
    def test_output_in_unit_range(self, img_u8, seed):
        x = jnp.asarray(_unit_image(img_u8))
        out = np.asarray(color_jitter(jax.random.PRNGKey(seed), x))
        assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6

    @given(_u8_images, _seeds)
    @settings(**_SETTINGS)
    def test_zero_strength_is_identity(self, img_u8, seed):
        x = _unit_image(img_u8)
        out = np.asarray(
            color_jitter(
                jax.random.PRNGKey(seed),
                jnp.asarray(x),
                brightness=0.0,
                contrast=0.0,
                saturation=0.0,
            )
        )
        np.testing.assert_allclose(out, x, atol=1e-6)


class TestRandomAffineInvariants:
    @given(_u8_images, _seeds)
    @settings(**_SETTINGS)
    def test_identity_parameters(self, img_u8, seed):
        x = _unit_image(img_u8)
        out = np.asarray(
            random_affine(
                jax.random.PRNGKey(seed),
                jnp.asarray(x),
                scale_range=(1.0, 1.0),
                translate=(0.0, 0.0),
            )
        )
        np.testing.assert_allclose(out, x, atol=1e-6)

    @given(_u8_images, _seeds)
    @settings(**_SETTINGS)
    def test_nearest_never_interpolates(self, img_u8, seed):
        x = _unit_image(img_u8)
        out = np.asarray(
            random_affine(
                jax.random.PRNGKey(seed),
                jnp.asarray(x),
                scale_range=(0.5, 2.0),
                translate=(0.25, 0.25),
            )
        )
        for c in range(3):
            allowed = np.concatenate([x[..., c].reshape(-1), [0.0]])
            dist = np.abs(
                out[..., c].reshape(-1, 1) - allowed[None, :]
            ).min(axis=1)
            assert dist.max() <= 1e-6, (
                "affine output contains a value that is neither an input "
                "pixel nor the zero fill (selection matmul blended pixels)"
            )


class TestMultiErasingInvariants:
    @given(_u8_images, _seeds)
    @settings(**_SETTINGS)
    def test_mask_multiply_semantics(self, img_u8, seed):
        x = _unit_image(img_u8)
        out = np.asarray(
            random_multi_erasing(jax.random.PRNGKey(seed), jnp.asarray(x), p=1.0)
        )
        keep_or_zero = (np.abs(out - x) <= 1e-6) | (np.abs(out) <= 1e-6)
        assert keep_or_zero.all(), (
            "multi-erasing produced a pixel that is neither kept nor zeroed"
        )
        # the whole 3-channel pixel shares one mask cell
        kept = np.abs(out - x) <= 1e-6
        zeroed = ~kept
        # channels of one pixel agree unless the pixel itself is ~0 (where
        # kept and zeroed coincide)
        ambiguous = np.abs(x) <= 1e-6
        per_pixel = (kept | ambiguous).all(axis=-1) | (
            zeroed | ambiguous
        ).all(axis=-1)
        assert per_pixel.all(), "mask differed across channels of one pixel"

    @given(_u8_images, _seeds)
    @settings(**_SETTINGS)
    def test_p_zero_is_identity(self, img_u8, seed):
        x = _unit_image(img_u8)
        out = np.asarray(
            random_multi_erasing(jax.random.PRNGKey(seed), jnp.asarray(x), p=0.0)
        )
        np.testing.assert_allclose(out, x, atol=0)
