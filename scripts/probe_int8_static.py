#!/usr/bin/env python
"""Probe: end-to-end int8 eval throughput with STATIC activation scales.

Dynamic per-tensor activation quantization costs one abs-max reduce pass
per conv input, which breaks XLA's elementwise fusions (measured: 10.3k
imgs/s vs 12.1k bf16 — docs/PERF.md). Static (calibrated) scales make the
quantize op pure elementwise. This probe patches the activation-scale
computation to a compile-time constant — numerically wrong, but the
throughput equals what a calibrated static-scale path would achieve.
Decides whether calibration infrastructure is worth building.
"""

from __future__ import annotations

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

    import rot_mvgaze_tpu.ops.quant as quant

    orig = quant.quantize_symmetric

    def fixed_act_scale(x, reduce_axes=None):
        if reduce_axes is None and x.ndim == 4:  # activations: fixed scale
            scale = jnp.asarray(8.0 / 127.0, jnp.float32)
            q = jnp.clip(
                jnp.round(x.astype(jnp.float32) / scale), -127, 127
            ).astype(jnp.int8)
            return q, scale
        return orig(x, reduce_axes)

    quant.quantize_symmetric = fixed_act_scale

    from rot_mvgaze_tpu.augment.ops import eval_preprocess
    from rot_mvgaze_tpu.geometry import rotation_matrix_2d
    from rot_mvgaze_tpu.models import FeatRotationSymm

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    size = 224
    model = FeatRotationSymm(
        backbone_depth=50, num_iter=3, dtype=jnp.bfloat16, int8_backbone=True
    )
    init_data = {
        "img_0": jnp.zeros((2, size, size, 3)),
        "img_1": jnp.zeros((2, size, size, 3)),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, init_data)
    rng = np.random.default_rng(0)
    b = jax.device_put(
        {
            "img_0": rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8),
            "img_1": rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8),
            "hp_0": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
            "hp_1": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
        }
    )

    @jax.jit
    def fwd(variables, b, hp_0):
        data = {
            "img_0": eval_preprocess(b["img_0"], size),
            "img_1": eval_preprocess(b["img_1"], size),
            "rot_0": rotation_matrix_2d(b["hp_0"] + 0.01 * jnp.tanh(hp_0)),
            "rot_1": rotation_matrix_2d(b["hp_1"]),
        }
        return model.apply(variables, data, train=False)["pred_gaze"]

    out = jnp.zeros((batch, 2), jnp.float32)
    for _ in range(3):
        out = fwd(variables, b, out)
    np.asarray(jax.device_get(out[:1]))
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(variables, b, out)
    np.asarray(jax.device_get(out[:1]))
    dt = time.perf_counter() - t0
    print(f"static-scale int8 eval: {2 * batch * n / dt:.1f} imgs/s "
          f"(bf16 reference 12136, dynamic int8 10306)")


if __name__ == "__main__":
    main()
