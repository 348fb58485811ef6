"""Pure train/eval step builders — shared by the Trainer, the multi-chip
dry-run entry, and the benchmarks.

Each builder closes over static config (model, loss, optimizer, image size)
and returns a pure jittable function. The train step contains the ENTIRE
per-iteration pipeline: on-device augmentation of both uint8 views,
head-pose -> SO(3), forward, loss, backward, Adam update — the host's only
job is feeding uint8 batches (contrast /root/reference/trainer.py:117-147,
where augmentation runs on CPU workers and loss/error sync to host per step).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from rot_mvgaze_tpu.augment.ops import eval_preprocess, train_preprocess
from rot_mvgaze_tpu.geometry import rotation_matrix_2d
from rot_mvgaze_tpu.geometry.gaze import angular_error as angular_error_jnp


def prepare_rotations(batch: Dict[str, Any]) -> Dict[str, Any]:
    """head_pose -> rotation matrices + float labels (parity:
    Trainer.prepare_dual_input, /root/reference/trainer.py:99-114)."""
    return {
        "rot_0": rotation_matrix_2d(batch["head_pose_0"].astype(jnp.float32)),
        "rot_1": rotation_matrix_2d(batch["head_pose_1"].astype(jnp.float32)),
        "gt_gaze": batch["gt_gaze"].astype(jnp.float32),
        "gt_gaze_1": batch["gt_gaze_1"].astype(jnp.float32),
    }


def augment_views(
    key: jax.Array,
    batch: Dict[str, Any],
    image_size: int,
    dtype: Any = jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Apply the stochastic train stack to both uint8 views (one owner of
    the per-batch split+vmap wiring: augment.ops.train_preprocess)."""
    k0, k1 = jax.random.split(key)
    return {
        view: train_preprocess(k, batch[view], image_size, dtype)
        for view, k in (("img_0", k0), ("img_1", k1))
    }


def update_ema(ema_params: Any, new_params: Any, ema_decay: float) -> Any:
    """One EMA step: ``d*ema + (1-d)*params`` leafwise (identity when
    disabled). Shared by the stereo and V-view train steps."""
    if not ema_decay:
        return ema_params  # None (or an untouched tree) passes through
    if ema_params is None:
        raise ValueError(
            "ema_decay > 0 requires state.ema_params to be initialized "
            "(a params-shaped tree); the Trainer seeds it with the initial "
            "params"
        )
    return jax.tree.map(
        lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
        ema_params,
        new_params,
    )


def make_train_step(
    model: Any,
    metrics: Callable[[Dict[str, Any]], jnp.ndarray],
    tx: optax.GradientTransformation,
    image_size: int = 224,
    schedule: Callable = None,
    with_images: bool = False,
    augment_dtype: Any = None,
    fold_key_by_step: bool = False,
    augment: bool = True,
    grad_accum: int = 1,
    image_sharding: Any = None,
    freeze_bn: bool = False,
    ema_decay: float = 0.0,
) -> Callable:
    """Returns ``(state, batch, key) -> (state, stats)``.

    ``state`` is any pytree with .step/.params/.batch_stats/.opt_state
    (rot_mvgaze_tpu.train.trainer.TrainState).

    ``augment=False`` expects pre-augmented float views (skips the on-device
    stack). ``grad_accum=N`` splits the batch into N sequential micro-batches
    whose gradients are AVERAGED before one optimizer update — the standard
    way to train effective batches larger than HBM allows (each micro-batch
    normalizes with its own statistics, like torch gradient accumulation;
    running BN stats update once per micro-batch). Peak activation memory is
    that of one micro-batch.

    ``freeze_bn=True`` is the standard fine-tuning recipe (when warm-starting
    from ``--pretrained_backbone`` / ``--ckpt_resume``): every normalization
    layer uses its RUNNING statistics — a pure affine op — and
    ``state.batch_stats`` passes through unchanged. Affine scale/bias stay
    trainable. Besides the semantics, this deletes the per-step batch-stat
    reductions and their backward (the ``multiply_reduce_fusion`` class that
    the r2 device trace prices at ~15% of the step, docs/PERF.md) — the one
    step-time lever the bandwidth-bound roofline leaves open. The reference
    has no equivalent (its BN is always train-mode batch-stat,
    /root/reference/trainer.py:121-143); this is a framework-added option,
    OFF by default so training dynamics match the reference exactly.

    ``ema_decay=d`` (0 < d < 1) maintains an exponential moving average of
    the parameters in ``state.ema_params``: ``ema <- d*ema + (1-d)*params``
    AFTER the optimizer update, entirely inside the jitted step — with the
    state donated this is one fused multiply-add over the param tree per
    step (no extra dispatch, no extra live buffers beyond the EMA tree
    itself). ``state.ema_params`` must be a params-shaped tree (the Trainer
    initializes it to a copy of the initial params, so no bias correction
    is needed). 0 disables: ``ema_params`` passes through unchanged (None
    stays None). Framework-added — the reference trains/evals raw weights
    only; eval-side consumers prefer the EMA tree when present.

    ``image_sharding`` (a ``NamedSharding``, used with a 2-D ``(data,
    spatial)`` mesh) re-pins the augmented views to the sharded layout
    before they enter the backbone. Without the constraint GSPMD is free to
    resolve the augmentation stage's gathers by replicating the spatial
    axis — and once replicated it stays replicated, silently degrading
    spatial partitioning to duplicated per-device compute (observed on the
    compiled HLO: zero halo collectives, full-height per-device conv
    shapes). The constraint makes the backbone's H-sharded layout a hard
    boundary GSPMD must honor.
    """
    from rot_mvgaze_tpu.train.trainer import TrainState

    # Default the augmentation pipeline to the model's compute dtype: with a
    # bf16 model the augment passes are pure overhead at f32 (the model casts
    # immediately), so run them at bf16 too.
    aug_dtype = (
        augment_dtype
        if augment_dtype is not None
        else getattr(model, "dtype", jnp.float32)
    )

    def prepare(key, batch):
        from rot_mvgaze_tpu.parallel.mesh import pin_images

        if augment:
            imgs = augment_views(key, batch, image_size, aug_dtype)
        else:
            imgs = {"img_0": batch["img_0"], "img_1": batch["img_1"]}
        return {
            **pin_images(imgs, image_sharding),
            **prepare_rotations(batch),
        }

    def loss_and_grads(params, batch_stats, data):
        def loss_fn(params):
            if freeze_bn:
                # Running-stat (eval-mode) normalization, stats untouched:
                # BN is a pure trainable affine here, so there is nothing
                # mutable and no stat reduction in the compiled step.
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    data,
                    train=False,
                )
                return metrics(out), (out, batch_stats)
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                data,
                train=True,
                mutable=["batch_stats"],
            )
            return metrics(out), (out, updates["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        error = jnp.mean(angular_error_jnp(out["pred_gaze"], data["gt_gaze"]))
        return loss, error, grads, new_stats

    def train_step(state, batch: Dict[str, Any], key: jax.Array):
        if fold_key_by_step:
            # Derive the per-step PRNG key ON DEVICE from the step counter:
            # the host passes the same base key every step, eliminating a
            # per-step host->device dispatch (a tiny op that costs ~ms each
            # over a tunneled backend). Equally deterministic: the step
            # counter sequence is fixed.
            key = jax.random.fold_in(key, state.step)

        if grad_accum == 1:
            data = prepare(key, batch)
            loss, error, grads, new_stats = loss_and_grads(
                state.params, state.batch_stats, data
            )
        else:
            # [B, ...] -> [A, B/A, ...] with INTERLEAVED rows (micro a takes
            # rows a::A): under a batch-sharded mesh every micro-batch then
            # keeps an even slice of every device's block, so the scan body
            # stays data-parallel without resharding. Scanned sequentially
            # (fresh PRNG key each), gradients averaged.
            def split(x):
                return x.reshape(
                    x.shape[0] // grad_accum, grad_accum, *x.shape[1:]
                ).swapaxes(0, 1)

            micro = jax.tree.map(split, batch)

            def body(carry, inp):
                stats_c, gacc, lacc, eacc = carry
                mb, i = inp
                data = prepare(jax.random.fold_in(key, i), mb)
                loss, error, grads, stats_c = loss_and_grads(
                    state.params, stats_c, data
                )
                gacc = jax.tree.map(jnp.add, gacc, grads)
                return (stats_c, gacc, lacc + loss, eacc + error), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, gsum, lsum, esum), _ = jax.lax.scan(
                body,
                (state.batch_stats, zeros, jnp.zeros(()), jnp.zeros(())),
                (micro, jnp.arange(grad_accum)),
            )
            grads = jax.tree.map(lambda g: g / grad_accum, gsum)
            loss, error = lsum / grad_accum, esum / grad_accum
            # logging previews: re-augment only the 8 logged rows of the
            # first micro-batch, not the whole micro-batch
            data = prepare(
                jax.random.fold_in(key, 0),
                jax.tree.map(lambda x: x[0][:8], micro),
            ) if with_images else None

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=update_ema(state.ema_params, new_params, ema_decay),
        )
        stats = {"loss_gaze": loss, "error_gaze": error}
        if schedule is not None:
            stats["lr"] = schedule(state.step)
        if with_images:
            stats["img_0"] = data["img_0"][:8].astype(jnp.float32)
            stats["img_1"] = data["img_1"][:8].astype(jnp.float32)
        return new_state, stats

    return train_step


def make_eval_step(
    model: Any, image_size: int = 224, image_sharding: Any = None
) -> Callable:
    """Returns ``(params, batch_stats, batch) -> {pred_gaze, gt_gaze, ...}``.

    ``image_sharding``: see ``make_train_step`` — re-pins the preprocessed
    views to the H-sharded layout on a 2-D ``(data, spatial)`` mesh."""

    def eval_step(params, batch_stats, batch: Dict[str, Any]):
        from rot_mvgaze_tpu.parallel.mesh import pin_images

        data = pin_images(
            {
                "img_0": eval_preprocess(batch["img_0"], image_size),
                "img_1": eval_preprocess(batch["img_1"], image_size),
            },
            image_sharding,
        )
        data.update(prepare_rotations(batch))
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, data, train=False
        )
        return {
            "pred_gaze": out["pred_gaze"],
            "gt_gaze": data["gt_gaze"],
            "img_0": data["img_0"][:8],
            "img_1": data["img_1"][:8],
        }

    return eval_step
