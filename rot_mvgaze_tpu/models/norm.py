"""Flax BatchNorm module backed by the Pallas fused kernels.

Drop-in for ``nn.BatchNorm`` with the SAME parameter/stat tree layout
(params: {scale, bias}; batch_stats: {mean, var}) so checkpoints convert
identically — plus fused ReLU and residual-add, which the profile shows are
the train step's real cost (docs/PERF.md).

Stat semantics follow torch BatchNorm2d exactly: normalization uses the
biased batch variance; the running variance is updated with the UNBIASED
variance (torch's ``n/(n-1)`` correction) — flax's nn.BatchNorm stores the
biased variance instead, a small train-dynamics deviation this module
avoids.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rot_mvgaze_tpu.ops.batchnorm import fused_batchnorm_act


class PallasBatchNormAct(nn.Module):
    """BatchNorm (+ optional fused residual-add and ReLU)."""

    momentum: float = 0.9  # running = running*momentum + stat*(1-momentum)
    epsilon: float = 1e-5
    relu: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train and not self.is_initializing():
            y, bmean, bvar = fused_batchnorm_act(
                x, scale, bias, residual, self.epsilon, self.relu
            )
            n = x.size // c
            unbiased = bvar * (n / max(n - 1, 1))
            ra_mean.value = (
                ra_mean.value * self.momentum
                + jax.lax.stop_gradient(bmean) * (1 - self.momentum)
            )
            ra_var.value = (
                ra_var.value * self.momentum
                + jax.lax.stop_gradient(unbiased) * (1 - self.momentum)
            )
            return y

        # eval (or init): pure elementwise affine — XLA fuses this optimally.
        rstd = jax.lax.rsqrt(ra_var.value + self.epsilon)
        a = (scale.astype(jnp.float32) * rstd).astype(self.dtype)
        b = (
            bias.astype(jnp.float32) - ra_mean.value * scale.astype(jnp.float32) * rstd
        ).astype(self.dtype)
        y = x.astype(self.dtype) * a + b
        if residual is not None:
            y = y + residual.astype(self.dtype)
        if self.relu:
            y = jnp.maximum(y, 0)
        return y
