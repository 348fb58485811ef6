"""Generic stacked-block builders (MLP / conv nets).

Capability parity with /root/reference/models/backbones/blocks.py:7-126:
per-layer linear/conv + optional norm + activation, with the LAST layer bare.
Rebuilt as flax.linen modules; the MLP is the workhorse of the fusion model
(lifter, fusers, gaze heads).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax.nn.initializers import Initializer

from rot_mvgaze_tpu.models.norm import TorchBatchNorm


def torch_linear_init(fan_in: int) -> tuple[Initializer, Initializer]:
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) kernel+bias initializers.

    Matches torch.nn.Linear's default init so training-from-scratch dynamics
    track the reference. torch's Conv2d/ConvTranspose2d defaults
    (``kaiming_uniform_(a=sqrt(5))`` + uniform bias) reduce to the SAME
    bound with the conv fan-in (``k*k*in_ch``; transpose: ``k*k*out_ch`` —
    torch computes fan-in from weight dim 1), so the conv builders below
    reuse this with the appropriate fan_in.
    """
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init, init


class Mlp(nn.Module):
    """Stack of Dense layers with an activation between all but the last.

    ``Mlp(features=[h0, h1, ..., out])`` mirrors the reference
    ``Mlp(in_channel, out_channels=[h0, ..., out])``
    (/root/reference/models/backbones/blocks.py:63-82): activation (ReLU by
    default) after every layer except the final one, no normalization unless
    ``use_batchnorm`` is set.

    Dense submodules are named ``dense_{i}`` — the checkpoint converter maps
    the reference's ``blocks.{i}.0.{weight,bias}`` onto these.
    """

    features: Sequence[int]
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu
    use_batchnorm: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        num_layers = len(self.features)
        for i, feat in enumerate(self.features):
            fan_in = x.shape[-1]
            kinit, binit = torch_linear_init(fan_in)
            x = nn.Dense(
                feat,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=kinit,
                bias_init=binit,
                name=f"dense_{i}",
            )(x)
            if i < num_layers - 1:
                if self.use_batchnorm:
                    x = TorchBatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"bn_{i}",
                    )(x)
                x = self.activation(x)
        return x


class Conv2dNet(nn.Module):
    """Stacked Conv+BN+ReLU blocks, last layer bare conv (NHWC).

    Parity with /root/reference/models/backbones/blocks.py:85-105.
    """

    features: Sequence[int]
    kernels: Sequence[int]
    strides: Optional[Sequence[int]] = None
    paddings: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        num_layers = len(self.features)
        for i, feat in enumerate(self.features):
            k = self.kernels[i]
            s = self.strides[i] if self.strides is not None else 1
            p = self.paddings[i] if self.paddings is not None else 0
            kinit, binit = torch_linear_init(k * k * x.shape[-1])
            x = nn.Conv(
                feat,
                kernel_size=(k, k),
                strides=(s, s),
                padding=[(p, p), (p, p)],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=kinit,
                bias_init=binit,
                name=f"conv_{i}",
            )(x)
            if i < num_layers - 1:
                x = TorchBatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"bn_{i}",
                )(x)
                x = nn.relu(x)
        return x


class Conv2dTransposeNet(nn.Module):
    """Stacked ConvTranspose+BN+LeakyReLU blocks, last layer bare (NHWC).

    Parity with /root/reference/models/backbones/blocks.py:108-126.
    ``paddings`` follow TORCH ConvTranspose2d semantics (output size
    ``(in-1)*s - 2p + k``); flax's explicit transpose padding differs, so
    torch ``p`` maps to flax ``k-1-p`` with ``transpose_kernel=True``
    (verified numerically against torch — both shape and values).
    """

    features: Sequence[int]
    kernels: Sequence[int]
    strides: Optional[Sequence[int]] = None
    paddings: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        num_layers = len(self.features)
        for i, feat in enumerate(self.features):
            k = self.kernels[i]
            s = self.strides[i] if self.strides is not None else 1
            p = self.paddings[i] if self.paddings is not None else 0
            # torch ConvTranspose fan-in is weight dim 1 * k * k = out*k*k
            kinit, binit = torch_linear_init(k * k * feat)
            x = nn.ConvTranspose(
                feat,
                kernel_size=(k, k),
                strides=(s, s),
                padding=[(k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)],
                transpose_kernel=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=kinit,
                bias_init=binit,
                name=f"convt_{i}",
            )(x)
            if i < num_layers - 1:
                x = TorchBatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"bn_{i}",
                )(x)
                x = nn.leaky_relu(x)
        return x


def weight_copy(params_dst, params_src):
    """Copy parameters across matching pytrees (parity with the torch helper
    at /root/reference/models/backbones/blocks.py:129-132 — in JAX params are
    immutable pytrees, so this is a structure-, shape- and dtype-checked
    functional copy)."""
    import jax

    if jax.tree.structure(params_dst) != jax.tree.structure(params_src):
        raise ValueError("parameter tree structures differ")

    def check_copy(d, s):
        if jnp.shape(d) != jnp.shape(s):
            raise ValueError(
                f"leaf shape mismatch: dst {jnp.shape(d)} vs src {jnp.shape(s)}"
            )
        return s

    return jax.tree.map(check_copy, params_dst, params_src)
