#!/usr/bin/env python
"""Measure the conv+BN-stat-epilogue lever (VERDICT r4 item #2).

Times, on the real chip, for R50 layer3's 3x3 stride-1 conv shape at the
bench batch (B=256 images, 14x14x256 NHWC bf16):

  a) XLA conv alone                       — the fused-epilogue upper bound
  b) XLA conv + separate per-channel sum/sumsq reduces — what the model's
     train-mode BN costs today (the reduce re-reads the conv output)
  c) Pallas conv WITH the stat epilogue (ops/conv_bn.py), tile sweep

The lever is real only if (c) < (b): a single-pass kernel must beat the
two-pass XLA pipeline. If (c) loses even to (b), the "fuse BN stats into
conv epilogues" path is falsified by direct measurement (not inference
from BN-level kernels), and the single-chip ceiling statement in
BASELINE.md becomes formal.

Timing honesty on the tunneled backend (see scripts/bench_eval.py): each
timed call is data-dependent on the previous output and fenced by a host
readback.

Prints one JSON line with ms/call for each variant + the correctness
deltas vs the XLA conv.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rot_mvgaze_tpu.ops.conv_bn import (
        conv3x3_bn_stats,
        conv3x3_bn_stats_reference,
    )

    B = int(os.environ.get("PROBE_BATCH", "256"))
    H = W = int(os.environ.get("PROBE_HW", "14"))
    C = int(os.environ.get("PROBE_C", "256"))
    n_steps = int(os.environ.get("PROBE_STEPS", "50"))

    def say(msg):
        print(msg, file=sys.stderr, flush=True)

    say(f"probe_conv_bn_epilogue: B={B} HxW={H}x{W} C={C} "
        f"backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    )
    w = jax.device_put(
        jnp.asarray(0.05 * rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
    )

    @jax.jit
    def xla_conv_only(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    xla_conv_stats = jax.jit(conv3x3_bn_stats_reference)

    def chain(f, feedback):
        """x <- f(x) with a tiny data-dependent perturbation so repeated
        dispatches are never identical (tunnel short-circuit defense)."""
        def step(x):
            out = f(x)
            return feedback(x, out)
        return jax.jit(step)

    def timed(step, x0, label):
        xx = x0
        for _ in range(3):
            xx = step(xx)
        jax.block_until_ready(xx)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            xx = step(xx)
        jax.block_until_ready(xx)
        ms = (time.perf_counter() - t0) / n_steps * 1e3
        say(f"{label}: {ms:.3f} ms/call")
        return ms

    record = {"B": B, "HW": H, "C": C, "n_steps": n_steps}

    # correctness first (single dispatch each); tile = the largest sweep
    # point dividing B so any PROBE_BATCH the sweep tolerates works here
    tiles = [tb for tb in (4, 8, 16) if B % tb == 0]
    if not tiles:
        raise SystemExit(
            f"PROBE_BATCH={B} is divisible by none of the sweep tiles "
            "(4, 8, 16); pick a multiple of 4"
        )
    check_tile = min(tiles, key=lambda t: abs(t - 8))
    ref_out, ref_stats = xla_conv_stats(x, w)
    pl_out, pl_stats = conv3x3_bn_stats(x, w, batch_tile=check_tile)
    record["out_max_abs_diff"] = float(
        jnp.max(jnp.abs(pl_out.astype(jnp.float32)
                        - ref_out.astype(jnp.float32)))
    )
    record["stats_max_rel_diff"] = float(
        jnp.max(jnp.abs(pl_stats - ref_stats)
                / (jnp.abs(ref_stats) + 1e-3))
    )
    say(f"correctness: out Δmax={record['out_max_abs_diff']:.4g} "
        f"stats relΔ={record['stats_max_rel_diff']:.4g}")

    fb_conv = lambda x, out: x + 0.001 * out.astype(x.dtype)
    fb_pair = lambda x, pair: x + 0.001 * pair[0].astype(x.dtype)

    record["xla_conv_ms"] = timed(
        chain(lambda x: xla_conv_only(x, w), fb_conv), x, "xla conv only")
    record["xla_conv_plus_stats_ms"] = timed(
        chain(lambda x: xla_conv_stats(x, w), fb_pair), x,
        "xla conv + separate stats")
    for tb in tiles:
        try:
            record[f"pallas_conv_bn_tb{tb}_ms"] = timed(
                chain(lambda x, tb=tb: conv3x3_bn_stats(x, w, batch_tile=tb),
                      fb_pair),
                x, f"pallas conv+stats tb={tb}")
        except Exception as e:  # VMEM OOM at large tiles: record, keep going
            msg = str(e).splitlines()[0][:160]
            say(f"pallas tb={tb} failed: {msg}")
            record[f"pallas_conv_bn_tb{tb}_error"] = msg

    times = [v for k, v in record.items()
             if k.startswith("pallas_conv_bn") and k.endswith("_ms")]
    if times:
        record["verdict"] = (
            "lever_real" if min(times) < record["xla_conv_plus_stats_ms"]
            else "falsified"
        )
    else:
        record["verdict"] = "all_tiles_failed"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
