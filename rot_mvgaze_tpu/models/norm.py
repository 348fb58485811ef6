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


class TorchBatchNorm(nn.Module):
    """``nn.BatchNorm`` drop-in with torch BatchNorm2d's running-stat
    semantics on the plain-XLA path.

    torch normalizes with the BIASED batch variance but updates the running
    variance with the UNBIASED one (``n/(n-1)`` Bessel correction,
    /root/reference/models/resnet.py uses torch BatchNorm2d); flax's
    nn.BatchNorm stores the biased variance, so default-path training
    dynamics drift slightly from the reference. Tree layout is identical
    (params: {scale, bias}; batch_stats: {mean, var}) — checkpoints convert
    unchanged.

    Stats are computed in float32; normalization is applied in ``dtype`` as
    one fused affine (``x*a + b``) so the bf16 path keeps its bandwidth.
    ``axis_name`` syncs batch stats across shard_map/pmap replicas; under
    GSPMD jit the plain reductions are already global.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros
    # Ghost-stat subsampling (r3 perf experiment, opt-in): compute the
    # train-mode batch statistics from the FIRST B//k batch rows only
    # (x[:B//k] — a contiguous prefix, which XLA fuses into a smaller
    # reduce; a strided x[::k] was measured 37% SLOWER end-to-end, see
    # docs/PERF.md), cutting the stat-reduce's HBM read pass ~k-fold.
    # Batch rows are i.i.d. under shuffling, so prefix == every-k-th
    # statistically. Noisier stats (ghost-batch regime) — a deliberate
    # training-dynamics deviation from the reference, like fuse_views.
    # 1 = exact (default).
    stat_subsample: int = 1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, use_running_average: Optional[bool] = None
    ) -> jnp.ndarray:
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)

        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            k = self.stat_subsample
            if k < 1:
                raise ValueError(f"stat_subsample must be >= 1, got {k}")
            if k > 1 and x.shape[0] < 2 * k:
                # fewer than 2 rows would survive — stats degenerate
                raise ValueError(
                    f"stat_subsample={k} leaves <2 of {x.shape[0]} batch rows"
                )
            xs = x if k == 1 else x[: x.shape[0] // k]
            xf = xs.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = xs.size // c
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )

        rstd = jax.lax.rsqrt(var + self.epsilon)
        a = (scale.astype(jnp.float32) * rstd).astype(self.dtype)
        b = (
            bias.astype(jnp.float32) - mean * scale.astype(jnp.float32) * rstd
        ).astype(self.dtype)
        return x.astype(self.dtype) * a + b


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
