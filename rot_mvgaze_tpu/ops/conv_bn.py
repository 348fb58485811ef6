"""Pallas 3x3 conv WITH BN-stat epilogue — the one unmeasured lever.

docs/PERF.md's single-chip ceiling analysis (r3/r4) claims that reaching
3,000 imgs/s/chip at reference semantics requires fusing the train-mode
BatchNorm statistics reductions *into the conv epilogues* — the conv
output is in VMEM anyway, so emitting per-channel sum/sumsq there deletes
the separate HBM read pass each BN stat reduce costs. Earlier rounds only
attempted BN-level Pallas kernels (opaque BNs that broke XLA's conv
fusions, −40%); this module is the bounded CONV-LEVEL attempt VERDICT r4
item #2 asks for: a 3x3 stride-1 same-pad NHWC conv (R50 layer3's most
regular shape class, /root/reference/models/resnet.py:88-98 ≙
rot_mvgaze_tpu/models/resnet.py BottleneckBlock conv2) that returns
``(conv_out bf16, stats (2, C) f32)`` in ONE pass over the input.

Kernel design (pallas_guide.md): grid over batch tiles; each program holds
its (TB, H, W, C) input block in VMEM, computes the conv as 9 statically
shifted (TB*H*W, C) x (C, C) MXU GEMMs accumulated in an f32 VMEM scratch
(zero-padding via static slice+concat shifts — no gather, no dynamic
shapes), then reduces the block's per-channel sum/sumsq and accumulates
them into a single (2, C) f32 output across the sequential TPU grid
(init at program 0 — the standard revisiting-output pattern).

Measured end-to-end by scripts/probe_conv_bn_epilogue.py; see
docs/PERF.md "Conv-epilogue BN stats (r5)" for the verdict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[n, y, x, c] = in[n, y+dy, x+dx, c], zero outside — the tap
    window of a same-pad 3x3 conv, built from STATIC slices so Mosaic
    sees fixed shapes (dy/dx are Python ints from the tap loop)."""
    z = jnp.zeros_like
    if dy == 1:
        x = jnp.concatenate([x[:, 1:], z(x[:, :1])], axis=1)
    elif dy == -1:
        x = jnp.concatenate([z(x[:, :1]), x[:, :-1]], axis=1)
    if dx == 1:
        x = jnp.concatenate([x[:, :, 1:], z(x[:, :, :1])], axis=2)
    elif dx == -1:
        x = jnp.concatenate([z(x[:, :, :1]), x[:, :, :-1]], axis=2)
    return x


def _kernel(x_ref, w_ref, out_ref, stats_ref):
    i = pl.program_id(0)
    TB, H, W, C = x_ref.shape
    x = x_ref[:]
    acc = jnp.zeros((TB * H * W, w_ref.shape[2]), jnp.float32)
    for tap in range(9):
        dy, dx = tap // 3 - 1, tap % 3 - 1
        shifted = _shift2d(x, dy, dx).reshape(TB * H * W, C)
        acc = acc + jnp.dot(
            shifted, w_ref[tap], preferred_element_type=jnp.float32
        )
    out_ref[:] = acc.reshape(out_ref.shape).astype(out_ref.dtype)

    # BN-stat epilogue: the block's per-channel sum / sum-of-squares while
    # the conv output is still in VMEM (this is the whole point — the
    # separate XLA reduce re-reads it from HBM). Accumulate across the
    # sequential grid into one (2, C) block.
    block_stats = jnp.stack(
        [jnp.sum(acc, axis=0), jnp.sum(acc * acc, axis=0)]
    )

    @pl.when(i == 0)
    def _():
        stats_ref[:] = block_stats

    @pl.when(i > 0)
    def _():
        stats_ref[:] = stats_ref[:] + block_stats


@functools.partial(jax.jit, static_argnames=("batch_tile",))
def conv3x3_bn_stats(
    x: jnp.ndarray, w: jnp.ndarray, batch_tile: int = 16
):
    """3x3 stride-1 same-pad NHWC conv + per-channel (sum, sumsq).

    ``x (B, H, W, C) bf16``, ``w (3, 3, C, C)`` HWIO -> ``(out (B, H, W, C)
    bf16, stats (2, C) f32)``. ``B`` must divide by ``batch_tile``.
    """
    B, H, W, C = x.shape
    if B % batch_tile:
        raise ValueError(f"B={B} not divisible by batch_tile={batch_tile}")
    if w.shape[:2] != (3, 3) or w.shape[2] != C:
        raise ValueError(f"w must be (3,3,{C},Cout); got {w.shape}")
    Cout = w.shape[3]
    w9 = w.reshape(9, C, Cout).astype(x.dtype)
    grid = (B // batch_tile,)
    out, stats = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, H, W, C),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all 9 taps resident
        ],
        out_specs=[
            pl.BlockSpec(
                (batch_tile, H, W, Cout),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # every program maps the SAME (2, C) block -> sequential-grid
            # accumulation (TPU grids execute in order)
            pl.BlockSpec((2, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ],
    )(x, w9)
    return out, stats


def conv3x3_bn_stats_reference(x: jnp.ndarray, w: jnp.ndarray):
    """XLA twin: lax conv + the separate stat reduces it would run."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    flat = out.reshape(-1, out.shape[-1])
    stats = jnp.stack([jnp.sum(flat, axis=0), jnp.sum(flat * flat, axis=0)])
    return out.astype(jnp.bfloat16), stats
