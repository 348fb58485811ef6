#!/usr/bin/env python
"""Secondary benchmarks: eval-forward throughput and serving latency.

(The driver's headline metric is bench.py at the repo root — the train step.
This script measures the inference-side story for docs/PERF.md.)

Measurement honesty on the tunneled backend: repeated IDENTICAL dispatches
are short-circuited by the transport and ``block_until_ready`` can return
before execution ("ready-before-done", docs/PERF.md measurement notes), so
every timed call here is made data-dependent on the previous call's output
(the predicted pitchyaw feeds the next call's head pose) and the timing
fence is a host readback of the final result.

Env: BENCH_BATCH (128), SERVE_BATCH (8), BENCH_INT8=1 for the int8 MXU
serving path with dynamic activation scales, BENCH_INT8=static for
calibrated static scales (ops/quant.py), BENCH_NUM_VIEWS=V (>2) for the
V-view FeatRotationMultiView serving path over stacked (N,V,H,W,3)
requests (counts V*batch images).

Prints one JSON line:
  {"eval_imgs_per_sec": ..., "serving_p50_ms": ..., "serving_batch": ...,
   "int8": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from rot_mvgaze_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from rot_mvgaze_tpu.augment.ops import eval_preprocess
    from rot_mvgaze_tpu.geometry import rotation_matrix_2d

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    serve_batch = int(os.environ.get("SERVE_BATCH", "8"))
    raw = os.environ.get("BENCH_INT8", "0")
    allowed = {"0": False, "1": True, "static": "static"}
    if raw not in allowed:
        raise SystemExit(
            f"BENCH_INT8 must be 0, 1, or static; got {raw!r} (a typo'd "
            "value used to flow into the model config verbatim and "
            "silently bench the dynamic path)"
        )
    int8 = allowed[raw]
    num_views = int(os.environ.get("BENCH_NUM_VIEWS", "2"))
    if num_views < 2:
        raise SystemExit(
            f"BENCH_NUM_VIEWS must be >= 2; got {num_views}"
        )
    multiview = num_views > 2
    size = 224

    # Unbuffered stage progress (same rationale as __graft_entry__'s dryrun:
    # a hang/timeout must leave a diagnostic tail, not an empty log —
    # first-compiles over the tunnel can take minutes and look stuck).
    import functools

    t_start = time.monotonic()

    def say(msg):
        print(f"[{time.monotonic() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    say(f"bench_eval: batch={batch} serve_batch={serve_batch} int8={int8} "
        f"num_views={num_views} backend={jax.default_backend()}")

    from rot_mvgaze_tpu.utils.drivers import Workload

    # one owner of the stereo/V-view model + init-data wiring (drivers.py;
    # this file used to inline its own copy — r5 review batch)
    workload = Workload(num_views=num_views, backbone_depth=50, num_iter=3,
                        dtype=jnp.bfloat16, int8_backbone=int8)
    model = workload.model
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, workload.init_data(size)
    )
    say("params initialized")

    rng = np.random.default_rng(0)

    def make_batch(n):
        if multiview:
            return jax.device_put(
                {
                    "imgs": rng.integers(
                        0, 256, (n, num_views, size, size, 3), dtype=np.uint8
                    ),
                    "head_poses": rng.uniform(
                        -0.8, 0.8, (n, num_views, 2)
                    ).astype(np.float32),
                }
            )
        return jax.device_put(
            {
                "img_0": rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8),
                "img_1": rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8),
                "hp_0": rng.uniform(-0.8, 0.8, (n, 2)).astype(np.float32),
                "hp_1": rng.uniform(-0.8, 0.8, (n, 2)).astype(np.float32),
            }
        )

    @jax.jit
    def fwd(variables, b, hp_0, step):
        # chain: previous prediction perturbs this call's head pose
        # (data-dependent ordering) PLUS a distinct step scalar — the
        # 0.01*tanh feedback alone is a ~1% contraction whose iterates
        # converge to a bitwise f32 fixed point after a few calls,
        # re-enabling the identical-dispatch short-circuit this chain
        # exists to defeat; the step term guarantees distinct inputs
        perturb = 0.01 * jnp.tanh(hp_0) + 0.001 * step
        if multiview:
            flat = b["imgs"].reshape((-1,) + b["imgs"].shape[2:])
            proc = eval_preprocess(flat, size)
            data = {
                "imgs": proc.reshape(
                    b["imgs"].shape[:2] + proc.shape[1:]
                ),
                # (N,2) feedback rides every view's pose (trailing-axis)
                "rots": rotation_matrix_2d(
                    b["head_poses"] + perturb[:, None, :]
                ),
            }
        else:
            data = {
                "img_0": eval_preprocess(b["img_0"], size),
                "img_1": eval_preprocess(b["img_1"], size),
                "rot_0": rotation_matrix_2d(b["hp_0"] + perturb),
                "rot_1": rotation_matrix_2d(b["hp_1"]),
            }
        return model.apply(variables, data, train=False)["pred_gaze"]

    _step_counter = iter(range(10**9))

    def fwd_chained(variables, b, hp_0):
        # step rides the execute call as a tiny traced scalar argument
        return fwd(variables, b, hp_0, np.float32(next(_step_counter) % 997))

    def fence(x):
        return np.asarray(jax.device_get(x[:1]))

    # throughput (big batch)
    big = make_batch(batch)
    if int8 == "static":
        # one calibration pass (mutable quant collection) before benching —
        # the same graph production serves (serving.make_calibration_forward
        # / make_multiview_calibration_forward)
        if multiview:
            from rot_mvgaze_tpu.serving import (
                make_multiview_calibration_forward,
            )

            calib = jax.jit(make_multiview_calibration_forward(model, size))
            _, quant = calib(variables, big["imgs"], big["head_poses"])
        else:
            from rot_mvgaze_tpu.serving import make_calibration_forward

            calib = jax.jit(make_calibration_forward(model, size))
            _, quant = calib(
                variables, big["img_0"], big["img_1"], big["hp_0"], big["hp_1"]
            )
        variables = {**variables, "quant": quant}

    out = jnp.zeros((batch, 2), jnp.float32)
    say("compiling+warming eval forward (first compile can take minutes) ...")
    for _ in range(3):
        out = fwd_chained(variables, big, out)
    fence(out)
    say("warmup done; timing throughput ...")
    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = fwd_chained(variables, big, out)
    fence(out)
    dt = time.perf_counter() - t0
    eval_ips = num_views * batch * n_steps / dt
    say(f"throughput: {eval_ips:.1f} imgs/s; timing serving latency ...")

    # latency (small batch, per-call fence = request/response)
    small = make_batch(serve_batch)
    sout = jnp.zeros((serve_batch, 2), jnp.float32)
    for _ in range(3):
        sout = fwd_chained(variables, small, sout)
    fence(sout)
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        sout = fwd_chained(variables, small, sout)
        fence(sout)
        lat.append((time.perf_counter() - t0) * 1e3)
    print(
        json.dumps(
            {
                "eval_imgs_per_sec": round(eval_ips, 1),
                "serving_p50_ms": round(float(np.percentile(lat, 50)), 2),
                "serving_p99_ms": round(float(np.percentile(lat, 99)), 2),
                "serving_batch": serve_batch,
                "int8": int8,
                "num_views": num_views,
            }
        )
    )


if __name__ == "__main__":
    main()
