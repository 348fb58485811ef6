"""Symmetric int8 quantization for the inference path (v5e int8 MXU).

TPU v5e executes int8 x int8 -> int32 contractions at ~2x the bf16 MXU rate
(measured on-chip: ~1.5x end-to-end per conv after the quantize/dequantize
epilogues — scripts/probe_int8.py, docs/PERF.md). The serving path uses:

- per-output-channel weight scales (computed from the float checkpoint at
  trace time — weights are tiny next to activations, so this costs nothing
  measurable and keeps the param tree IDENTICAL to the float model: any
  checkpoint serves both paths);
- dynamic per-tensor activation scales (one abs-max reduce per conv input
  — no calibration dataset needed, robust to distribution shift);
- int32 accumulation, dequantized into the model's compute dtype so BN /
  ReLU / residual epilogues are untouched.

Eval/serving only: quantization is applied where ``train=False`` routes
through :class:`QuantConv`; the training path is exact bf16/f32.

The reference has no quantized path (PyTorch fp32 end-to-end).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

_EPS = 1e-12


def quantize_symmetric(
    x: jnp.ndarray, reduce_axes: Optional[Sequence[int]] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization: returns ``(q, scale)`` with
    ``x ~= q * scale``. ``reduce_axes=None`` -> one per-tensor scale;
    otherwise the scale is computed over those axes (kept as size-1 dims).
    """
    xf = x.astype(jnp.float32)
    if reduce_axes is None:
        amax = jnp.max(jnp.abs(xf))
    else:
        amax = jnp.max(jnp.abs(xf), axis=tuple(reduce_axes), keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int],
    padding: Any,
    feature_group_count: int = 1,
    out_dtype: Any = jnp.float32,
    act_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NHWC conv with int8 quantization of both operands.

    ``kernel`` is the float HWIO checkpoint weight; its per-output-channel
    scales are recomputed each call (cheap: the kernel is KBs against MBs of
    activations, and XLA fuses the quantize pass into the preceding op).

    ``act_scale``: optional pre-calibrated scalar activation scale. With it,
    the activation quantize is a pure elementwise op that fuses into the
    producing epilogue; without it, a dynamic abs-max reduce runs per call
    (an extra pass over ``x`` — measured ~1.5x slower end-to-end than the
    calibrated path on v5e, docs/PERF.md r2b).
    """
    w8, sw = quantize_symmetric(kernel, reduce_axes=(0, 1, 2))  # (1,1,1,O)
    if act_scale is None:
        x8, sx = quantize_symmetric(x)  # scalar, dynamic
    else:
        sx = act_scale.astype(jnp.float32)
        x8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) / sx), -127, 127
        ).astype(jnp.int8)
    y = lax.conv_general_dilated(
        x8,
        w8,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    rescale = (sx * sw.reshape(1, 1, 1, -1)).astype(jnp.float32)
    return (y.astype(jnp.float32) * rescale).astype(out_dtype)


def int8_dense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """(B, K) @ (K, N) with int8 operands / int32 accumulation; per-output-
    column weight scales, per-tensor dynamic activation scale."""
    w8, sw = quantize_symmetric(kernel, reduce_axes=(0,))  # (1, N)
    x8, sx = quantize_symmetric(x)
    y = lax.dot_general(
        x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (sx * sw.reshape(1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
