#!/usr/bin/env python
"""Probe: does an int8 conv/dot reach the v5e int8 MXU fast path?

Times bf16 vs int8 (int32-accum) convolution and dot_general on
representative R50 shapes. The tunneled backend reports implausible times
for single small dispatches (docs/PERF.md "Measurement notes"), so each
case runs a CHAIN of data-dependent iterations inside one jitted fori_loop
and reports per-iteration time. Decides whether a quantized inference path
is worth building (v5e int8 MXU peak is ~2x bf16). Run on the real chip:

    python scripts/probe_int8.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 100


@partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def conv_chain(x, w, n):
    int8 = x.dtype == jnp.int8

    def body(i, c):
        y = lax.conv_general_dilated(
            c, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32 if int8 else None,
        )
        if int8:
            # requantize so the carry stays int8 (cheap elementwise)
            return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        # Normalize by the filter's gain so the carry's magnitude is
        # PRESERVED: a fixed 1e-2 made the chain a ~0.24x/iter contraction
        # that underflowed bf16 to exact zeros ~70 iterations in, turning
        # the timed reps into identical all-zero dispatches — the very
        # short-circuit this chain exists to defeat.
        return y * inv_gain.astype(c.dtype)

    # traced scalar (computed once per call, outside the loop body): the
    # filter-gain normalizer that keeps the carry's magnitude constant
    inv_gain = jax.lax.rsqrt(
        jnp.sum(w.astype(jnp.float32) ** 2) / w.shape[-1]
    )
    if not int8:
        # renormalize the carry to unit RMS at each chain ENTRY so residual
        # per-iteration gain error cannot compound across chained calls
        x = (x.astype(jnp.float32)
             * jax.lax.rsqrt(jnp.mean(x.astype(jnp.float32) ** 2) + 1e-12)
             ).astype(x.dtype)
    return lax.fori_loop(0, n, body, x)


@partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def dot_chain(a, b, n):
    int8 = a.dtype == jnp.int8

    def body(i, c):
        y = lax.dot_general(
            c, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int8 else None,
        )
        if int8:
            return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        return y * inv_gain.astype(c.dtype)  # magnitude-preserving

    inv_gain = jax.lax.rsqrt(
        jnp.sum(b.astype(jnp.float32) ** 2) / b.shape[-1]
    )
    if not int8:
        a = (a.astype(jnp.float32)
             * jax.lax.rsqrt(jnp.mean(a.astype(jnp.float32) ** 2) + 1e-12)
             ).astype(a.dtype)
    return lax.fori_loop(0, n, body, a)


def timeit(fn, x, w):
    """Feed each call's output back as the next call's input: the tunneled
    backend apparently short-circuits repeated identical dispatches, so only
    a data-dependent chain of calls gives honest times."""
    x = fn(x, w, ITERS)  # compile
    _ = np.asarray(jax.device_get(x[:1, :1]))  # hard fence: host readback
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        x = fn(x, w, ITERS)
    _ = np.asarray(jax.device_get(x[:1, :1]))  # forces completion for real
    return (time.perf_counter() - t0) / (reps * ITERS) * 1e3  # ms / iter


def main():
    rng = np.random.default_rng(0)
    print(jax.devices())

    cases = [
        ("conv 128x56x56x64 3x3x64x64", (128, 56, 56, 64), (3, 3, 64, 64)),
        ("conv 128x28x28x128 3x3x128x128", (128, 28, 28, 128), (3, 3, 128, 128)),
        ("conv 128x14x14x256 3x3x256x256", (128, 14, 14, 256), (3, 3, 256, 256)),
    ]
    for name, xs, ws in cases:
        x8 = jnp.asarray(rng.integers(-127, 127, xs, dtype=np.int8))
        w8 = jnp.asarray(rng.integers(-127, 127, ws, dtype=np.int8))
        xb = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal(ws), jnp.bfloat16)
        tb = timeit(conv_chain, xb, wb)
        t8 = timeit(conv_chain, x8, w8)
        macs = np.prod(xs) * ws[0] * ws[1] * ws[3]
        print(f"{name}: bf16 {tb:.3f} ms ({2*macs/tb/1e9:.1f} TF/s)  "
              f"int8 {t8:.3f} ms ({2*macs/t8/1e9:.1f} TOP/s)  "
              f"speedup {tb/t8:.2f}x")

    for name, ashape, bshape in [
        ("dot 4096x2048 x 2048x2048", (4096, 2048), (2048, 2048)),
    ]:
        a8 = jnp.asarray(rng.integers(-127, 127, ashape, dtype=np.int8))
        b8 = jnp.asarray(rng.integers(-127, 127, bshape, dtype=np.int8))
        ab = jnp.asarray(rng.standard_normal(ashape), jnp.bfloat16)
        bb = jnp.asarray(rng.standard_normal(bshape), jnp.bfloat16)
        tb = timeit(dot_chain, ab, bb)
        t8 = timeit(dot_chain, a8, b8)
        macs = ashape[0] * ashape[1] * bshape[1]
        print(f"{name}: bf16 {tb:.3f} ms ({2*macs/tb/1e9:.1f} TF/s)  "
              f"int8 {t8:.3f} ms ({2*macs/t8/1e9:.1f} TOP/s)  "
              f"speedup {tb/t8:.2f}x")


if __name__ == "__main__":
    main()
