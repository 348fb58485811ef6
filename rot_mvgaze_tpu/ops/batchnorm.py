"""Pallas fused training-mode BatchNorm (+ optional ReLU / residual add).

Why: profiling the flagship train step (docs/PERF.md) shows ~95% of device
time in BN batch-stat reduce fusions (~51 ms/step at ~137 GB/s — 6x off HBM
peak) and the surrounding elementwise chains; convolutions are almost free.
These kernels re-express the three memory-bound passes of train-mode BN as
flat (N, C) Pallas kernels that stream HBM at near peak:

  forward:  pass 1  per-channel sum / sum-of-squares        (reduce)
            pass 2  y = act(x_hat * scale + bias [+ res])   (elementwise)
  backward: pass 3  sum_g, sum_g_xhat                        (reduce)
            pass 4  dx = scale*rstd*(g - sum_g/N - xhat*sum_g_xhat/N)

with a jax.custom_vjp tying them together. ReLU is folded into pass 2 and
its mask is recomputed from y in the backward (no mask storage); an optional
residual input is added before the activation (the ResNet block tail
``relu(bn(conv(x)) + identity)``).

Semantics match torch BatchNorm2d in train mode (biased variance for
normalization; the running-stat update — including torch's UNBIASED running
var — lives in the flax wrapper in rot_mvgaze_tpu/models/norm.py).
Eval-mode BN is a pure elementwise affine; XLA already fuses that optimally,
so these kernels are train-only.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-block VMEM budget for the streamed operand (bytes).
_BLOCK_BUDGET = 2 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chunk_rows(n: int, c: int, itemsize: int, n_operands: int = 1) -> int:
    """Largest divisor of n whose block (rows x c) fits the VMEM budget."""
    budget_rows = max(8, _BLOCK_BUDGET // (c * itemsize * n_operands))
    best = 8
    g = 1
    while g <= n:
        rows = n // g
        if n % g == 0 and rows <= budget_rows:
            best = rows
            break
        g += 1
    return best


# ---------------------------------------------------------------------------
# pass 1: stats
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)
    xf = x_ref[:].astype(jnp.float32)
    s = jnp.sum(xf, axis=0, keepdims=True)
    q = jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = s
        sq_ref[:] = q

    @pl.when(i > 0)
    def _():
        sum_ref[:] += s
        sq_ref[:] += q


def _stats(x2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n, c = x2.shape
    rows = _chunk_rows(n, c, x2.dtype.itemsize)
    return pl.pallas_call(
        _stats_kernel,
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=_interpret(),
    )(x2)


# ---------------------------------------------------------------------------
# pass 2: normalize + affine (+ residual) (+ relu)
# ---------------------------------------------------------------------------


def _apply_kernel(x_ref, a_ref, b_ref, out_ref, *, relu):
    y = x_ref[:].astype(jnp.float32) * a_ref[:] + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def _apply_res_kernel(x_ref, res_ref, a_ref, b_ref, out_ref, *, relu):
    y = (
        x_ref[:].astype(jnp.float32) * a_ref[:]
        + b_ref[:]
        + res_ref[:].astype(jnp.float32)
    )
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def _apply(x2, res2, a, b, relu):
    n, c = x2.shape
    n_ops = 3 if res2 is not None else 2
    rows = _chunk_rows(n, c, x2.dtype.itemsize, n_operands=n_ops)
    grid = (n // rows,)
    blk = pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if res2 is None:
        return pl.pallas_call(
            partial(_apply_kernel, relu=relu),
            grid=grid,
            in_specs=[blk, vec, vec],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((n, c), x2.dtype),
            interpret=_interpret(),
        )(x2, a, b)
    return pl.pallas_call(
        partial(_apply_res_kernel, relu=relu),
        grid=grid,
        in_specs=[blk, blk, vec, vec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, c), x2.dtype),
        interpret=_interpret(),
    )(x2, res2, a, b)


# ---------------------------------------------------------------------------
# pass 3: backward reductions
# ---------------------------------------------------------------------------


def _bwd_reduce_kernel(*refs, relu):
    # with relu the mask is recomputed from y; without, y is NOT an operand
    # at all (streaming it was one full wasted HBM pass per backward on an
    # op whose purpose is bandwidth recovery)
    if relu:
        g_ref, y_ref, x_ref, m_ref, r_ref, sg_ref, sgx_ref = refs
    else:
        g_ref, x_ref, m_ref, r_ref, sg_ref, sgx_ref = refs
    i = pl.program_id(0)
    g = g_ref[:].astype(jnp.float32)
    if relu:
        g = jnp.where(y_ref[:].astype(jnp.float32) > 0.0, g, 0.0)
    xhat = (x_ref[:].astype(jnp.float32) - m_ref[:]) * r_ref[:]
    sg = jnp.sum(g, axis=0, keepdims=True)
    sgx = jnp.sum(g * xhat, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        sg_ref[:] = sg
        sgx_ref[:] = sgx

    @pl.when(i > 0)
    def _():
        sg_ref[:] += sg
        sgx_ref[:] += sgx


def _bwd_reduce(g2, y2, x2, mean, rstd, relu):
    n, c = x2.shape
    n_ops = 3 if relu else 2
    rows = _chunk_rows(n, c, x2.dtype.itemsize, n_operands=n_ops)
    blk = pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    operands = (g2, y2, x2, mean, rstd) if relu else (g2, x2, mean, rstd)
    return pl.pallas_call(
        partial(_bwd_reduce_kernel, relu=relu),
        grid=(n // rows,),
        in_specs=[blk] * (3 if relu else 2) + [vec, vec],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=_interpret(),
    )(*operands)


# ---------------------------------------------------------------------------
# pass 4: dx
# ---------------------------------------------------------------------------


def _bwd_dx_kernel(*refs, relu):
    if relu:
        g_ref, y_ref, x_ref, m_ref, r_ref, k_ref, mg_ref, mgx_ref, dx_ref = refs
    else:
        g_ref, x_ref, m_ref, r_ref, k_ref, mg_ref, mgx_ref, dx_ref = refs
    g = g_ref[:].astype(jnp.float32)
    if relu:
        g = jnp.where(y_ref[:].astype(jnp.float32) > 0.0, g, 0.0)
    xhat = (x_ref[:].astype(jnp.float32) - m_ref[:]) * r_ref[:]
    dx = k_ref[:] * (g - mg_ref[:] - xhat * mgx_ref[:])
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _bwd_dx(g2, y2, x2, mean, rstd, scale_rstd, mg, mgx, relu):
    n, c = x2.shape
    n_ops = 4 if relu else 3
    rows = _chunk_rows(n, c, x2.dtype.itemsize, n_operands=n_ops)
    blk = pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    operands = ((g2, y2, x2, mean, rstd, scale_rstd, mg, mgx) if relu
                else (g2, x2, mean, rstd, scale_rstd, mg, mgx))
    return pl.pallas_call(
        partial(_bwd_dx_kernel, relu=relu),
        grid=(n // rows,),
        in_specs=[blk] * (3 if relu else 2) + [vec] * 5,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, c), x2.dtype),
        interpret=_interpret(),
    )(*operands)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_batchnorm_act(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    residual: Optional[jnp.ndarray],
    eps: float = 1e-5,
    relu: bool = True,
):
    """Training-mode BN over the leading dims of NHWC ``x`` with optional
    fused residual-add and ReLU.

    Returns ``(y, batch_mean, batch_var)`` (biased variance, f32)."""
    y, mean, var, _ = _fwd_impl(x, scale, bias, residual, eps, relu)
    return y, mean, var


def _fwd_impl(x, scale, bias, residual, eps, relu):
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    n = x2.shape[0]
    s, q = _stats(x2)
    mean = s / n
    var = jnp.maximum(q / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = (scale.astype(jnp.float32) * rstd).reshape(1, c)
    b = (bias.astype(jnp.float32) - mean.reshape(-1) * a.reshape(-1)).reshape(1, c)
    res2 = residual.reshape(-1, c) if residual is not None else None
    y2 = _apply(x2, res2, a, b, relu)
    y = y2.reshape(x.shape)
    return y, mean.reshape(-1), var.reshape(-1), rstd.reshape(1, c)


def _fwd_vjp(x, scale, bias, residual, eps, relu):
    y, mean, var, rstd = _fwd_impl(x, scale, bias, residual, eps, relu)
    has_res = residual is not None
    # bias's DTYPE rides along so dbias matches the primal aval (custom_vjp
    # rejects a mismatched cotangent dtype; scale/bias need not share one).
    # y is saved ONLY for the relu mask — without relu a dtype proto stands
    # in, so the full activation is not kept alive as a residual.
    return (y, mean, var), (
        x, scale, jnp.zeros((), bias.dtype),
        y if relu else jnp.zeros((), y.dtype),
        mean.reshape(1, -1), rstd, has_res,
    )


def _bwd_vjp(eps, relu, res, cotangents):
    g, gmean, gvar = cotangents
    x, scale, bias_proto, y, mean, rstd, has_res = res
    c = x.shape[-1]
    n = x.size // c
    x2 = x.reshape(-1, c)
    y2 = y.reshape(-1, c) if relu else None  # kernels take no y without relu
    g2 = g.reshape(-1, c)
    sg, sgx = _bwd_reduce(g2, y2, x2, mean, rstd, relu)
    dscale = sgx.reshape(-1).astype(scale.dtype)
    dbias = sg.reshape(-1).astype(bias_proto.dtype)
    scale_rstd = (scale.astype(jnp.float32).reshape(1, c) * rstd).astype(
        jnp.float32
    )
    dx = _bwd_dx(
        g2, y2, x2, mean, rstd, scale_rstd, sg / n, sgx / n, relu
    ).reshape(x.shape)
    # Cotangents of the returned batch statistics (consumers normally
    # stop_gradient these for the running-stat update — PallasBatchNormAct
    # does — but the public op must be correct for ANY consumer):
    #   d(mean_c)/dx_ic = 1/n ;  d(var_c)/dx_ic = 2 (x_ic - mean_c) / n
    gm = jnp.asarray(gmean, jnp.float32).reshape(1, c)
    gv = jnp.asarray(gvar, jnp.float32).reshape(1, c)
    dx_stats = (gm + gv * 2.0 * (x2.astype(jnp.float32) - mean)) / n
    dx = dx + dx_stats.reshape(x.shape).astype(dx.dtype)
    if not has_res:
        dres = None
    elif relu:
        # residual grad shares the relu mask
        dres = jnp.where(y > 0, g, 0).astype(g.dtype)
    else:
        dres = g
    return dx, dscale, dbias, dres


fused_batchnorm_act.defvjp(_fwd_vjp, _bwd_vjp)
