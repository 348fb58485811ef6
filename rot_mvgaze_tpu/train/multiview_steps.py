"""Jittable train/eval steps for the V-view model (models.multiview).

Same contract and structure as ``train.steps`` (the stereo builders): the
full per-iteration pipeline — on-device augmentation of all V uint8 views,
head-pose -> SO(3), forward, loss, backward, Adam — compiles into ONE
program. Batches come from ``data.multiview.MultiViewGazeDataset``:

``{"imgs": (B,V,H,W,C) uint8, "gt_gazes": (B,V,2), "head_poses": (B,V,2)}``

The stats/eval output keys match the stereo builders (``loss_gaze``,
``error_gaze``, ``pred_gaze``, ``gt_gaze``, ``img_0``/``img_1`` previews of
the first two views), so the Trainer's logging/eval machinery composes
unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from rot_mvgaze_tpu.augment.ops import eval_preprocess, train_preprocess
from rot_mvgaze_tpu.geometry import rotation_matrix_2d
from rot_mvgaze_tpu.geometry.gaze import angular_error as angular_error_jnp
from rot_mvgaze_tpu.train.steps import update_ema


def prepare_multiview_rotations(batch: Dict[str, Any]) -> Dict[str, Any]:
    """head_poses (B,V,2) -> rots (B,V,3,3) + float labels (the V-view
    analogue of steps.prepare_rotations; rotation_matrix_2d is
    trailing-axis, so the view axis rides along)."""
    return {
        "rots": rotation_matrix_2d(batch["head_poses"].astype(jnp.float32)),
        "gt_gazes": batch["gt_gazes"].astype(jnp.float32),
    }


def _flatten_views(imgs: jnp.ndarray):
    B, V = imgs.shape[0], imgs.shape[1]
    return imgs.reshape((B * V,) + imgs.shape[2:]), B, V


def make_multiview_train_step(
    model: Any,
    metrics: Callable[[Dict[str, Any]], jnp.ndarray],
    tx: optax.GradientTransformation,
    image_size: int = 224,
    schedule: Callable = None,
    with_images: bool = False,
    fold_key_by_step: bool = False,
    augment: bool = True,
    freeze_bn: bool = False,
    ema_decay: float = 0.0,
) -> Callable:
    """Returns ``(state, batch, key) -> (state, stats)`` — see
    steps.make_train_step for the shared semantics (fold_key_by_step,
    freeze_bn, augment, ema_decay). All ``B*V`` views augment as one call
    with per-row independent randomness (train_preprocess vmaps per
    sample)."""
    from rot_mvgaze_tpu.train.trainer import TrainState

    aug_dtype = getattr(model, "dtype", jnp.float32)

    def prepare(key, batch):
        imgs = batch["imgs"]
        flat, B, V = _flatten_views(imgs)
        if augment:
            flat = train_preprocess(key, flat, image_size, aug_dtype)
        views = flat.reshape((B, V) + flat.shape[1:])
        return {"imgs": views, **prepare_multiview_rotations(batch)}

    def train_step(state, batch: Dict[str, Any], key: jax.Array):
        if fold_key_by_step:
            key = jax.random.fold_in(key, state.step)
        data = prepare(key, batch)

        def loss_fn(params):
            if freeze_bn:
                out = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    data,
                    train=False,
                )
                return metrics(out), (out, state.batch_stats)
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                data,
                train=True,
                mutable=["batch_stats"],
            )
            return metrics(out), (out, updates["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # the reference metric: view-0 head vs view-0 labels
        error = jnp.mean(
            angular_error_jnp(out["pred_gaze"], data["gt_gazes"][:, 0])
        )
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
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
            stats["img_0"] = data["imgs"][:8, 0].astype(jnp.float32)
            stats["img_1"] = data["imgs"][:8, 1].astype(jnp.float32)
        return new_state, stats

    return train_step


def make_multiview_eval_step(model: Any, image_size: int = 224) -> Callable:
    """Returns ``(params, batch_stats, batch) -> {pred_gaze, gt_gaze, ...}``
    with the stereo eval step's output keys (gt_gaze = view-0 labels)."""

    def eval_step(params, batch_stats, batch: Dict[str, Any]):
        flat, B, V = _flatten_views(batch["imgs"])
        flat = eval_preprocess(flat, image_size)
        data = {
            "imgs": flat.reshape((B, V) + flat.shape[1:]),
            **prepare_multiview_rotations(batch),
        }
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, data, train=False
        )
        return {
            "pred_gaze": out["pred_gaze"],
            "gt_gaze": data["gt_gazes"][:, 0],
            "img_0": data["imgs"][:8, 0],
            "img_1": data["imgs"][:8, 1],
        }

    return eval_step
