"""Pallas TPU kernel for the rotate-and-fuse block.

The model's custom hot op (SURVEY.md §2.3(a)) is, per fusion iteration and
view (/root/reference/models/rot_mv.py:234-239, 35-50):

    rotated = R_rel @ f_other                  # (B,3,3) @ (B,3,V)
    h       = relu([img_feat ; rotated.flat] @ W1 + b1)   # (B, D+3V) @ (D+3V, H)
    out     = h @ W2 + b2                       # (B, H) @ (H, 3V)

This module fuses the per-sample SO(3) rotation, the concat, the first GEMM,
bias and ReLU into ONE Pallas kernel (`rotate_concat_matmul_relu`):

- the concat is never materialized — the kernel computes
  ``img @ W1_img + Σ_i rotated_i @ W1_rot_i`` with the rotation applied as
  nine broadcast multiply-adds on (TB, V) tiles (VPU) feeding MXU dots;
- weights stream HBM->VMEM tile-by-tile via the grid BlockSpecs; activations
  stay resident in VMEM across the whole fused chain;
- accumulation in float32 regardless of input dtype
  (``preferred_element_type``), bf16-friendly.

The second GEMM is a plain dense matmul — XLA's tiling is already optimal
there, so it stays in XLA (don't hand-schedule what the compiler does well).
A ``jax.custom_vjp`` supplies the backward pass as standard XLA einsums, so
the kernel is usable in training as well as serving.

Shapes must be multiples of the TPU tile sizes (B: 8, V/D/H: 128); the
public wrapper pads the batch when needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Batch tile / output(hidden) tile. TH=256 keeps the double-buffered f32
# weight tiles ((D,TH) + (3,V,TH)) within the 16MB VMEM budget.
_TB = 128
_TH = 256


def _kernel(img_ref, feat_ref, rot_ref, w1i_ref, w1r_ref, b1_ref, out_ref):
    """One (TB, TH) tile of h = relu([img ; rot@feat] @ W1 + b1).

    img_ref  : (TB, D)        image feature tile
    feat_ref : (TB, 3, V)     other-view rotatable feature tile
    rot_ref  : (TB, 16)       relative rotation, rows flattened+padded (9->16)
    w1i_ref  : (D, TH)        W1 rows for the image part
    w1r_ref  : (3, V, TH)     W1 rows for the rotated part, per rotation row
    b1_ref   : (1, TH)
    out_ref  : (TB, TH)
    """
    acc = jnp.dot(
        img_ref[:], w1i_ref[:], preferred_element_type=jnp.float32
    )
    # rotated_i = Σ_j rot[b, i, j] * feat[b, j, :]  — nine fused (TB,V)
    # broadcast-MACs (VPU), each feeding one MXU dot with its W1 slice.
    for i in range(3):
        rotated_i = None
        for j in range(3):
            rij = rot_ref[:, i * 3 + j][:, None]  # (TB, 1)
            term = rij * feat_ref[:, j, :]
            rotated_i = term if rotated_i is None else rotated_i + term
        acc += jnp.dot(
            rotated_i.astype(img_ref.dtype),
            w1r_ref[i],
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = jnp.maximum(acc + b1_ref[:].astype(jnp.float32), 0.0).astype(
        out_ref.dtype
    )


def _rotate_concat_matmul_relu_impl(
    img_feat: jnp.ndarray,
    rot_feat: jnp.ndarray,
    rot: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
) -> jnp.ndarray:
    b, d = img_feat.shape
    _, three, v = rot_feat.shape
    h = w1.shape[1]
    assert three == 3 and w1.shape[0] == d + 3 * v, (img_feat.shape, w1.shape)
    assert b % _TB == 0 and h % _TH == 0 and d % 128 == 0 and v % 128 == 0

    # Split W1 into the image rows and the three rotated-feature row groups.
    w1i = w1[:d]
    w1r = w1[d:].reshape(3, v, h)
    # Pad the 3x3 rotation to a lane-friendly (B, 16) row-major vector.
    rot_flat = jnp.concatenate(
        [rot.reshape(b, 9), jnp.zeros((b, 7), rot.dtype)], axis=1
    )

    grid = (b // _TB, h // _TH)
    # Off-TPU (CPU tests) Pallas runs in interpreter mode.
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TB, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_TB, 3, v), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((_TB, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, _TH), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, v, _TH), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, _TH), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TB, _TH), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h), img_feat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (d + 3 * v) * h + 18 * b * v,
            bytes_accessed=(
                img_feat.size * img_feat.dtype.itemsize
                + rot_feat.size * rot_feat.dtype.itemsize
                + w1.size * w1.dtype.itemsize * (b // _TB)
                + b * h * img_feat.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(img_feat, rot_feat, rot_flat, w1i, w1r, b1.reshape(1, h))


@jax.custom_vjp
def rotate_concat_matmul_relu(img_feat, rot_feat, rot, w1, b1):
    """h = relu(concat([img_feat, (rot @ rot_feat).flatten(-2)]) @ w1 + b1).

    img_feat (B, D) · rot_feat (B, 3, V) · rot (B, 3, 3) · w1 (D+3V, H) ·
    b1 (H) -> (B, H). Fused Pallas forward; XLA backward.
    """
    return _rotate_concat_matmul_relu_impl(img_feat, rot_feat, rot, w1, b1)


def _fwd(img_feat, rot_feat, rot, w1, b1):
    h = _rotate_concat_matmul_relu_impl(img_feat, rot_feat, rot, w1, b1)
    # b1's DTYPE rides along so the backward can emit a cotangent matching
    # the primal aval (custom_vjp rejects a mismatched dtype at trace time;
    # hard-coding f32 only worked for callers that pre-cast the bias)
    return h, (img_feat, rot_feat, rot, w1, jnp.zeros((), b1.dtype), h)


def _bwd(res, g):
    img_feat, rot_feat, rot, w1, b1_proto, h = res
    d = img_feat.shape[1]
    v = rot_feat.shape[2]
    g = jnp.where(h > 0, g, 0.0).astype(img_feat.dtype)
    rotated = jnp.einsum(
        "bij,bjv->biv", rot, rot_feat.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(img_feat.dtype)
    x = jnp.concatenate([img_feat, rotated.reshape(-1, 3 * v)], axis=-1)
    dw1 = jnp.einsum("bk,bh->kh", x, g)
    db1 = jnp.sum(g, axis=0)
    dx = jnp.einsum("bh,kh->bk", g, w1)
    # match the primal aval: with bf16 img_feat and f32 w1 (a legal mixed-
    # dtype call the forward kernel accepts), dx promotes to f32 and an
    # uncast dimg would fail custom_vjp's cotangent-dtype check at trace time
    dimg = dx[:, :d].astype(img_feat.dtype)
    drotated = dx[:, d:].reshape(-1, 3, v)
    # d/d rot_feat: rotated = rot @ feat  =>  dfeat = rot^T @ drotated
    dfeat = jnp.einsum(
        "bji,bjv->biv", rot.astype(jnp.float32), drotated.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(rot_feat.dtype)
    # d rot = drotated @ feat^T
    drot = jnp.einsum(
        "biv,bjv->bij",
        drotated.astype(jnp.float32),
        rot_feat.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(rot.dtype)
    return dimg, dfeat, drot, dw1.astype(w1.dtype), db1.astype(b1_proto.dtype)


rotate_concat_matmul_relu.defvjp(_fwd, _bwd)


def fused_image_feat_fuser(
    img_feat: jnp.ndarray,
    rot_feat: jnp.ndarray,
    rot: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
) -> jnp.ndarray:
    """Full ImageFeatFuser with rotation folded in: Pallas layer-1 + XLA
    layer-2. Pads the batch to the kernel tile when needed."""
    b = img_feat.shape[0]
    pad = (-b) % _TB
    if pad:
        img_feat = jnp.pad(img_feat, ((0, pad), (0, 0)))
        rot_feat = jnp.pad(rot_feat, ((0, pad), (0, 0), (0, 0)))
        eye = jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype), (pad, 3, 3))
        rot = jnp.concatenate([rot, eye], axis=0)
    h = rotate_concat_matmul_relu(img_feat, rot_feat, rot, w1, b1)
    out = h @ w2 + b2
    return out[:b]
