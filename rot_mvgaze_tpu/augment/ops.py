"""On-device image preprocessing & augmentation (batched NHWC, PRNG-keyed).

The reference runs per-sample CPU augmentation inside DataLoader workers
(/root/reference/main.py:38-56, dataset/gaze.py:106-111). Here the whole stack
is a pure jit-compatible function over a uint8 batch — it fuses into the
train step, the host ships 4x fewer bytes, and every op has static shapes:

- ``color_jitter``: brightness 1.0 / contrast 0.1 / saturation 0.1 in random
  order (torchvision ColorJitter semantics; distribution-match).
- ``random_affine``: scale [0.99, 1.01] + translate [0.01, 0.01], nearest
  resample, fill 0 (torchvision RandomAffine defaults).
- ``resize_bilinear``: antialiased bilinear (torchvision Resize(antialias=True)).
- ``normalize``: ImageNet mean/std.
- ``random_multi_erasing``: coarse-dropout AFTER normalization
  (/root/reference/utils/augment.py:16-47): an ``hs x hs`` Bernoulli grid
  nearest-upsampled and multiplied in, with hs = int(1/dot_size) traced —
  implemented via per-pixel cell gather from a fixed-size random grid so
  shapes stay static under jit.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)

# hs = int(1/dot_size), dot_size in [0.05, 0.3] -> hs in [3, 20]
_MAX_ERASE_GRID = 20


def to_float(img_u8: jnp.ndarray, dtype: Any = jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] -> float [0,1] (torchvision ToTensor, minus the HWC->CHW
    transpose: we stay NHWC). ``dtype`` sets the augmentation pipeline's
    compute dtype: bfloat16 halves the HBM traffic of every augment pass
    (quantization ~0.4%/pixel — same order as the reference's own PIL-uint8
    per-op quantization, train-time stochastic path only)."""
    return img_u8.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)


def normalize(img: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization over the trailing channel axis
    (/root/reference/main.py:38-39,47) as one fused affine in the image's
    own dtype (f32 constants pre-folded)."""
    inv_std = (1.0 / IMAGENET_STD).astype(img.dtype)
    shift = (IMAGENET_MEAN / IMAGENET_STD).astype(img.dtype)
    return img * inv_std - shift


def resize_bilinear(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Antialiased bilinear resize of (..., H, W, C) to (..., size, size, C)."""
    out_shape = (*img.shape[:-3], size, size, img.shape[-1])
    if img.shape[-3:-1] == (size, size):
        return img
    return jax.image.resize(img, out_shape, method="linear", antialias=True)


# ---------------------------------------------------------------------------
# Color jitter
# ---------------------------------------------------------------------------

_GRAY_W = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # ITU-R 601-2 luma


def _blend(a: jnp.ndarray, b: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    f = f.astype(a.dtype)  # keep the elementwise pass in the pipeline dtype
    return jnp.clip(f * a + (1 - f) * b, 0, 1)


def _jitter_one(img: jnp.ndarray, op: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """Apply jitter op {0: brightness, 1: contrast, 2: saturation} to (H,W,C)."""

    def _gray(x):
        # inside the branches so the brightness branch (and the other two
        # switch arms per fori iteration) never pays the HxWx3 luma pass
        return jnp.tensordot(x, _GRAY_W.astype(x.dtype), axes=([-1], [0]))[..., None]

    def brightness(x):
        return _blend(x, jnp.zeros_like(x), factor)

    def contrast(x):
        return _blend(x, jnp.mean(_gray(x)), factor)

    def saturation(x):
        g = _gray(x)
        return _blend(x, jnp.broadcast_to(g, x.shape), factor)

    return jax.lax.switch(op, [brightness, contrast, saturation], img)


def color_jitter(
    key: jax.Array,
    img: jnp.ndarray,
    brightness: float = 1.0,
    contrast: float = 0.1,
    saturation: float = 0.1,
) -> jnp.ndarray:
    """torchvision ColorJitter over one (H,W,C) float image in [0,1]:
    factors ~ U[max(0, 1-x), 1+x], ops applied in random order."""
    k_perm, k_b, k_c, k_s = jax.random.split(key, 4)
    factors = jnp.stack(
        [
            jax.random.uniform(
                k, (), minval=max(0.0, 1.0 - x), maxval=1.0 + x
            )
            for k, x in ((k_b, brightness), (k_c, contrast), (k_s, saturation))
        ]
    )
    order = jax.random.permutation(k_perm, 3)

    def body(i, x):
        op = order[i]
        return _jitter_one(x, op, factors[op])

    return jax.lax.fori_loop(0, 3, body, img)


# ---------------------------------------------------------------------------
# Random affine (scale + translate, nearest resample, fill 0)
# ---------------------------------------------------------------------------


def _affine_warp_nearest(
    img: jnp.ndarray, scale: jnp.ndarray, tx: jnp.ndarray, ty: jnp.ndarray
) -> jnp.ndarray:
    """Warp (H,W,C) about its center: out(p) = img(C + (p - C - t)/s).

    TPU-native formulation: scale+translate is axis-separable, so the
    nearest-neighbor resample is two one-hot selection MATMULS (rows then
    columns) that run on the MXU — point gathers serialize on TPU and were
    ~100x slower here. Out-of-bounds fill-0 folds into the selection
    matrices (zeroed rows), exactly reproducing torchvision's fill=0.
    """
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) * 0.5, (w - 1) * 0.5
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    src_y = cy + (ys - cy - ty) / scale
    src_x = cx + (xs - cx - tx) / scale
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    ok_y = ((iy >= 0) & (iy < h)).astype(img.dtype)
    ok_x = ((ix >= 0) & (ix < w)).astype(img.dtype)
    # (H, H) / (W, W) one-hot selectors with OOB rows zeroed.
    sel_y = (
        jnp.clip(iy, 0, h - 1)[:, None] == jnp.arange(h)[None, :]
    ).astype(img.dtype) * ok_y[:, None]
    sel_x = (
        jnp.clip(ix, 0, w - 1)[:, None] == jnp.arange(w)[None, :]
    ).astype(img.dtype) * ok_x[:, None]
    # Default (bf16-capable) matmul precision: selectors are exact 0/1 and
    # each output is a single selected pixel; only the pixel value itself is
    # rounded to bf16 — immaterial for stochastic TRAIN augmentation (the
    # deterministic eval path never warps) and ~3x faster on the MXU.
    # rows: out1[o, w, c] = sum_h sel_y[o, h] img[h, w, c]
    out = jnp.einsum("oh,hwc->owc", sel_y, img)
    # cols: out2[o, p, c] = sum_w sel_x[p, w] out1[o, w, c]
    return jnp.einsum("pw,owc->opc", sel_x, out)


def random_affine(
    key: jax.Array,
    img: jnp.ndarray,
    scale_range: Tuple[float, float] = (0.99, 1.01),
    translate: Tuple[float, float] = (0.01, 0.01),
) -> jnp.ndarray:
    """torchvision RandomAffine(degrees=0, scale, translate) on one (H,W,C)
    image (/root/reference/main.py:44): scale ~ U[lo, hi], shift
    ~ round(U[-t*W, t*W]) px (torchvision RandomAffine.get_params rounds
    translations to whole pixels), nearest interpolation, zero fill."""
    h, w = img.shape[0], img.shape[1]
    k_s, k_tx, k_ty = jax.random.split(key, 3)
    scale = jax.random.uniform(k_s, (), minval=scale_range[0], maxval=scale_range[1])
    max_dx, max_dy = translate[0] * w, translate[1] * h
    tx = jnp.round(jax.random.uniform(k_tx, (), minval=-max_dx, maxval=max_dx))
    ty = jnp.round(jax.random.uniform(k_ty, (), minval=-max_dy, maxval=max_dy))
    return _affine_warp_nearest(img, scale, tx, ty)


# ---------------------------------------------------------------------------
# Random multi-erasing (coarse dropout)
# ---------------------------------------------------------------------------


def random_multi_erasing(
    key: jax.Array,
    img: jnp.ndarray,
    p: float = 0.5,
    proportion: Tuple[float, float] = (0.5, 0.6),
    dot_size: Tuple[float, float] = (0.05, 0.3),
) -> jnp.ndarray:
    """Coarse-dropout mask multiply (/root/reference/utils/augment.py:16-47).

    With prob ``p``: dot ~ U[dot_size], prop ~ U[proportion],
    ``hs = int(1/dot)``; an hs x hs keep-mask (keep prob 1-prop) is
    nearest-upsampled to the image and multiplied in. Static-shape version:
    pixel (y, x) reads cell ``(floor(y*hs/H), floor(x*hs/W))`` of a fixed
    MAX x MAX uniform grid thresholded at ``prop``.
    """
    h, w = img.shape[0], img.shape[1]
    g = _MAX_ERASE_GRID
    k_gate, k_dot, k_prop, k_grid = jax.random.split(key, 4)
    dot = jax.random.uniform(k_dot, (), minval=dot_size[0], maxval=dot_size[1])
    prop = jax.random.uniform(k_prop, (), minval=proportion[0], maxval=proportion[1])
    # Clamp to the static grid: a dot below 1/_MAX_ERASE_GRID would index
    # cells >= g, matching NO one-hot column — mask 0, i.e. the whole image
    # silently erased. Clamping degrades gracefully to the finest grid.
    hs = jnp.minimum(jnp.floor(1.0 / dot), g).astype(jnp.int32)

    # Keep mask per grid cell, nearest-upsampled to pixels via two one-hot
    # selection matmuls (cell-row x grid x cell-col) — MXU-friendly, no
    # point gathers (serialized on TPU).
    keep = (jax.random.uniform(k_grid, (g, g)) > prop).astype(img.dtype)
    ys = (jnp.arange(h, dtype=jnp.float32) * hs / h).astype(jnp.int32)
    xs = (jnp.arange(w, dtype=jnp.float32) * hs / w).astype(jnp.int32)
    sel_y = (ys[:, None] == jnp.arange(g)[None, :]).astype(img.dtype)
    sel_x = (xs[:, None] == jnp.arange(g)[None, :]).astype(img.dtype)
    # 0/1-valued contraction: exact at any matmul precision.
    mask = jnp.einsum("yg,gh,xh->yx", sel_y, keep, sel_x)[..., None]

    gate = jax.random.uniform(k_gate, ()) <= p
    return jnp.where(gate, img * mask, img)


# ---------------------------------------------------------------------------
# Full pipelines
# ---------------------------------------------------------------------------


def _train_preprocess_one(
    key: jax.Array,
    img_u8: jnp.ndarray,
    image_size: int,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    k_jit, k_aff, k_erase = jax.random.split(key, 3)
    x = to_float(img_u8, dtype)
    x = color_jitter(k_jit, x)
    x = random_affine(k_aff, x)
    x = resize_bilinear(x, image_size)
    x = normalize(x)
    x = random_multi_erasing(k_erase, x)
    return x


@partial(jax.jit, static_argnums=(2, 3))
def train_preprocess(
    key: jax.Array,
    img_u8: jnp.ndarray,
    image_size: int = 224,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Train-time stack over a (B,H,W,3) uint8 batch -> (B,S,S,3) float.

    Order matches /root/reference/main.py:41-49: jitter -> affine -> to-float
    semantics folded -> resize -> normalize -> multi-erasing. ``dtype``
    selects the pipeline compute dtype (bfloat16 halves HBM traffic).
    """
    keys = jax.random.split(key, img_u8.shape[0])
    return jax.vmap(
        lambda k, im: _train_preprocess_one(k, im, image_size, dtype)
    )(keys, img_u8)


@partial(jax.jit, static_argnums=(1,))
def eval_preprocess(img_u8: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """Deterministic eval stack (/root/reference/main.py:51-56): to-float ->
    resize -> normalize. Numerically exact vs the reference for same-size
    inputs (XGaze/MPII-NV patches are stored at 224^2, so resize is identity)."""
    return normalize(resize_bilinear(to_float(img_u8), image_size))


# Reference-compatible alias ("test_transform", /root/reference/main.py:51).
test_preprocess = eval_preprocess
