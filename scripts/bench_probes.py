#!/usr/bin/env python
"""Micro-probes for train-step cost attribution on the real chip.

  conv1       7x7/s2 3->64 conv at 224^2 (the TPU-hostile 3-channel conv)
  conv1_s2d   the same math after space-to-depth: 112^2 x 12 -> 4x4/s1
  bb_train    backbone fwd+bwd, train-mode BN (stat passes)
  bb_eval     backbone fwd+bwd, eval-mode BN (affine only) — the delta
              bounds what conv-epilogue BN-stat fusion could ever recover

Usage: python scripts/bench_probes.py conv1 conv1_s2d bb_train bb_eval
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("probes", nargs="+")
    p.add_argument("--batch", type=int, default=256)  # = 128 samples x 2 views
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    import jax

    from rot_mvgaze_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    b = args.batch
    rng = np.random.default_rng(0)

    def _fence(carry):
        """Force REAL completion: fetch a scalar that data-depends on carry.
        (block_until_ready on the tunneled backend can return early; an
        actual device_get of derived data cannot.)"""
        leaf = jax.tree.leaves(carry)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def bench(fn, carry, *fargs):
        """Timed loop with a data dependency through ``carry``; fenced by a
        host fetch of a derived scalar, not block_until_ready."""
        for _ in range(3):
            carry = fn(carry, *fargs)
        _fence(carry)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            carry = fn(carry, *fargs)
        _fence(carry)
        return (time.perf_counter() - t0) / args.steps

    def report(name, dt):
        print(
            json.dumps(
                {
                    "probe": name,
                    "batch_imgs": b,
                    "ms": round(dt * 1e3, 3),
                    "imgs_per_sec": round(b / dt, 1),
                }
            ),
            flush=True,
        )

    for probe in args.probes:
        if probe == "conv1":
            x = jnp.asarray(
                rng.standard_normal((b, 224, 224, 3)), jnp.bfloat16
            )
            w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.bfloat16)

            def f(w, x):
                def loss(w):
                    y = jax.lax.conv_general_dilated(
                        x, w, (2, 2), [(3, 3), (3, 3)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    return jnp.sum(y * y)

                g = jax.grad(loss)(w)
                return w - 1e-12 * g  # chain: next step depends on this one

            report(probe, bench(jax.jit(f, donate_argnums=(0,)), w, x))
        elif probe == "conv1_s2d":
            # space-to-depth 2x2: 224^2x3 -> 112^2x12; 7x7/s2 becomes 4x4/s1
            # over 12 channels (zero-padded 7->8 taps). Identical output math.
            x = jnp.asarray(
                rng.standard_normal((b, 112, 112, 12)), jnp.bfloat16
            )
            w = jnp.asarray(rng.standard_normal((4, 4, 12, 64)) * 0.1, jnp.bfloat16)

            def f2(w, x):
                def loss(w):
                    y = jax.lax.conv_general_dilated(
                        x, w, (1, 1), [(1, 2), (1, 2)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    return jnp.sum(y * y)

                g = jax.grad(loss)(w)
                return w - 1e-12 * g

            report(probe, bench(jax.jit(f2, donate_argnums=(0,)), w, x))
        elif probe in ("bb_train", "bb_eval"):
            from rot_mvgaze_tpu.models.resnet import resnet50

            bb = resnet50(dtype=jnp.bfloat16)
            x = jnp.asarray(rng.standard_normal((b, 224, 224, 3)), jnp.bfloat16)
            variables = bb.init(
                jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3))
            )
            train = probe == "bb_train"

            def f3(params, x):
                def loss(params):
                    if train:
                        y, _ = bb.apply(
                            {"params": params,
                             "batch_stats": variables["batch_stats"]},
                            x, True, mutable=["batch_stats"],
                        )
                    else:
                        y = bb.apply(
                            {"params": params,
                             "batch_stats": variables["batch_stats"]},
                            x, False,
                        )
                    return jnp.sum(y.astype(jnp.float32) ** 2)

                g = jax.grad(loss)(params)
                return jax.tree.map(lambda p, gg: p - 1e-12 * gg, params, g)

            report(
                probe,
                bench(jax.jit(f3, donate_argnums=(0,)), variables["params"], x),
            )
        else:
            raise SystemExit(f"unknown probe {probe}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
