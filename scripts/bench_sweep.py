#!/usr/bin/env python
"""Throughput lever sweep on the real chip (docs/PERF.md methodology).

Variants isolate where the train-step time goes and measure each candidate
lever end-to-end. Measurement honesty (docs/PERF.md notes): the tunneled
backend short-circuits repeated identical dispatches and its
block_until_ready is not a reliable fence, so every variant either donates
an evolving carry (full/noaug) or chains each call's input on the previous
call's output with a host-readback fence (augonly/bf16aug/fwdonly):

  full       the shipped bench.py step (augment + fwd + loss + bwd + adam)
  noaug      pre-augmented f32 inputs; fwd+loss+bwd+adam only
  augonly    augmentation of both views only
  bf16aug    augmentation computed in bfloat16
  fwdonly    eval forward only

Usage: python scripts/bench_sweep.py full noaug augonly bf16aug [--batch N]
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
    p.add_argument("variants", nargs="+")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    import jax

    from rot_mvgaze_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
    from rot_mvgaze_tpu.models import FeatRotationSymm
    from rot_mvgaze_tpu.train.schedule import cyclic_triangular2
    from rot_mvgaze_tpu.train.steps import augment_views, make_train_step
    from rot_mvgaze_tpu.train.trainer import TrainState, make_optimizer

    batch, size = args.batch, 224
    model = FeatRotationSymm(backbone_depth=50, num_iter=3, dtype=jnp.bfloat16)
    metrics = IterationLoss(
        loss=StereoL1Loss(rel_weight=0.01, reference_decay=1.0), iter_decay=0.5
    )
    tx = make_optimizer(cyclic_triangular2(1e-6, 1e-3, 1000, 1000))

    rng = np.random.default_rng(0)
    host = {
        "img_0": rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8),
        "img_1": rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8),
        "gt_gaze": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "gt_gaze_1": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "head_pose_0": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
        "head_pose_1": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
    }
    dev = jax.device_put(host)

    init_data = {
        "img_0": jnp.zeros((2, size, size, 3), jnp.float32),
        "img_1": jnp.zeros((2, size, size, 3), jnp.float32),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, init_data)

    def fresh_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )

    import optax

    from rot_mvgaze_tpu.train.steps import prepare_rotations

    def make_noaug_step():
        def step(state, data, key):
            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    data, train=True, mutable=["batch_stats"],
                )
                return metrics(out), updates["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            return (
                TrainState(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    batch_stats=new_stats,
                    opt_state=new_opt,
                ),
                {"loss_gaze": loss},
            )

        return step

    results = {}
    key = jax.random.PRNGKey(0)

    for v in args.variants:
        if v == "full":
            step = jax.jit(
                make_train_step(model, metrics, tx, image_size=size),
                donate_argnums=(0,),
            )
            s = fresh_state()
            for i in range(3):
                s, _ = step(s, dev, jax.random.fold_in(key, i))
            jax.block_until_ready(s.params)
            t0 = time.perf_counter()
            for i in range(args.steps):
                s, _ = step(s, dev, jax.random.fold_in(key, 100 + i))
            jax.block_until_ready(s.params)
            dt = (time.perf_counter() - t0) / args.steps
        elif v == "noaug":
            aug = jax.jit(
                lambda k, b: {**augment_views(k, b, size), **prepare_rotations(b)}
            )
            data = jax.block_until_ready(aug(key, dev))
            step = jax.jit(make_noaug_step(), donate_argnums=(0,))
            s = fresh_state()
            for i in range(3):
                s, _ = step(s, data, key)
            jax.block_until_ready(s.params)
            t0 = time.perf_counter()
            for i in range(args.steps):
                s, _ = step(s, data, key)
            jax.block_until_ready(s.params)
            dt = (time.perf_counter() - t0) / args.steps
        elif v == "augonly":
            # chain: a data-dependent uint8 salt perturbs the next input
            @jax.jit
            def aug_chain(k, b, salt):
                b2 = {**b, "img_0": b["img_0"] + salt}
                out = augment_views(k, b2, size)
                new_salt = (
                    jnp.abs(out["img_0"].astype(jnp.float32).sum()) % 251
                ).astype(jnp.uint8)
                return out, new_salt

            salt = jnp.uint8(0)
            out, salt = aug_chain(key, dev, salt)
            np.asarray(jax.device_get(salt))
            t0 = time.perf_counter()
            for i in range(args.steps):
                out, salt = aug_chain(jax.random.fold_in(key, i), dev, salt)
            np.asarray(jax.device_get(salt))
            dt = (time.perf_counter() - t0) / args.steps
        elif v == "bf16aug":
            from rot_mvgaze_tpu.augment import ops as A

            def aug_bf16(k, b):
                ks = jax.random.split(k, 2)
                o = {}
                for view, kk in (("img_0", ks[0]), ("img_1", ks[1])):
                    keys = jax.random.split(kk, batch)
                    o[view] = jax.vmap(
                        lambda q, im: A._train_preprocess_one(
                            q, im, size, jnp.bfloat16
                        )
                    )(keys, b[view])
                return o

            @jax.jit
            def aug_bf16_chain(k, b, salt):
                out = aug_bf16(k, {**b, "img_0": b["img_0"] + salt})
                new_salt = (
                    jnp.abs(out["img_0"].astype(jnp.float32).sum()) % 251
                ).astype(jnp.uint8)
                return out, new_salt

            salt = jnp.uint8(0)
            out, salt = aug_bf16_chain(key, dev, salt)
            np.asarray(jax.device_get(salt))
            t0 = time.perf_counter()
            for i in range(args.steps):
                out, salt = aug_bf16_chain(jax.random.fold_in(key, i), dev, salt)
            np.asarray(jax.device_get(salt))
            dt = (time.perf_counter() - t0) / args.steps
        elif v == "fwdonly":
            from rot_mvgaze_tpu.train.steps import make_eval_step

            inner = make_eval_step(model, size)

            @jax.jit
            def fwd_chain(params, stats, b, prev):
                b2 = {**b, "head_pose_0": b["head_pose_0"] + 0.01 * jnp.tanh(prev)}
                return inner(params, stats, b2)["pred_gaze"]

            prev = jnp.zeros((batch, 2), jnp.float32)
            prev = fwd_chain(variables["params"], variables["batch_stats"], dev, prev)
            np.asarray(jax.device_get(prev[:1]))
            t0 = time.perf_counter()
            for i in range(args.steps):
                prev = fwd_chain(
                    variables["params"], variables["batch_stats"], dev, prev
                )
            np.asarray(jax.device_get(prev[:1]))
            dt = (time.perf_counter() - t0) / args.steps
        else:
            raise SystemExit(f"unknown variant {v}")
        results[v] = dt
        print(
            json.dumps(
                {
                    "variant": v,
                    "batch": batch,
                    "ms_per_step": round(dt * 1e3, 2),
                    "imgs_per_sec": round(2 * batch / dt, 1),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
