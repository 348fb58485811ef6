"""Gradient accumulation (steps.make_train_step(grad_accum=N))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.train.schedule import cyclic_triangular2
from rot_mvgaze_tpu.train.steps import make_train_step
from rot_mvgaze_tpu.train.trainer import TrainState, make_optimizer


def _setup(batch=8):
    model = FeatRotationSymm(backbone_depth=18, num_iter=1)
    metrics = IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5)
    tx = make_optimizer(cyclic_triangular2(1e-4, 1e-4, 5, 5))
    rng = np.random.default_rng(0)
    raw = {
        "img_0": rng.standard_normal((batch, 32, 32, 3)).astype(np.float32),
        "img_1": rng.standard_normal((batch, 32, 32, 3)).astype(np.float32),
        "gt_gaze": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "gt_gaze_1": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "head_pose_0": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
        "head_pose_1": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
    }
    init_data = {
        "img_0": jnp.zeros((2, 32, 32, 3)),
        "img_1": jnp.zeros((2, 32, 32, 3)),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, init_data)

    def state():
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )

    return model, metrics, tx, raw, state


class _ToyModel:
    """Linear dict-in/dict-out model with the FeatRotationSymm apply
    signature, so the accumulation machinery can be checked BIT-EXACTLY.

    (A real BN backbone at random init is a chaotic amplifier: duplicate
    rows change f32 reduction order by ~1e-6 at the first BN and ~1e-1 by
    layer4, so full-vs-accum equivalence cannot be asserted through it.)
    """

    dtype = jnp.float32

    def apply(self, variables, data, train=False, mutable=None):
        w = variables["params"]["w"]  # (2,)
        feat = jnp.mean(data["img_0"], axis=(1, 2, 3))  # (B,)
        out = {"pred_gaze": feat[:, None] * w, "gt_gaze": data["gt_gaze"]}
        if mutable:
            return out, {"batch_stats": variables["batch_stats"]}
        return out


def test_accum_equals_full_batch_exactly_on_linear_model():
    """sum-of-micro-grads / A == full-batch grad when the loss is a mean and
    micro-batches partition the batch — checked bit-level through one
    SGD(lr=1) step (param delta == gradient) on a BN-free model. Catches
    scale bugs (sum vs mean), dropped micro-batches, and wrong splits."""
    import optax

    model = _ToyModel()

    def metrics(out):
        return jnp.mean((out["pred_gaze"] - out["gt_gaze"]) ** 2)

    tx = optax.sgd(1.0)
    rng = np.random.default_rng(3)
    batch = {
        "img_0": rng.standard_normal((8, 4, 4, 3)).astype(np.float32),
        "img_1": rng.standard_normal((8, 4, 4, 3)).astype(np.float32),
        "gt_gaze": rng.uniform(-1, 1, (8, 2)).astype(np.float32),
        "gt_gaze_1": rng.uniform(-1, 1, (8, 2)).astype(np.float32),
        "head_pose_0": rng.uniform(-0.8, 0.8, (8, 2)).astype(np.float32),
        "head_pose_1": rng.uniform(-0.8, 0.8, (8, 2)).astype(np.float32),
    }

    def fresh():
        params = {"w": jnp.asarray([0.3, -0.7])}
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats={},
            opt_state=tx.init(params),
        )

    key = jax.random.PRNGKey(0)
    full = jax.jit(
        make_train_step(model, metrics, tx, image_size=4, augment=False)
    )
    p0 = np.asarray(fresh().params["w"])
    s_full, st_full = full(fresh(), batch, key)
    for a in (2, 4, 8):
        accum = jax.jit(
            make_train_step(
                model, metrics, tx, image_size=4, augment=False, grad_accum=a
            )
        )
        s_acc, st_acc = accum(fresh(), batch, key)
        # identical gradient (== p0 - p1 at lr 1) up to reassociation ulps
        np.testing.assert_allclose(
            np.asarray(s_acc.params["w"]),
            np.asarray(s_full.params["w"]),
            atol=1e-6,
        )
        assert float(st_acc["loss_gaze"]) == pytest.approx(
            float(st_full["loss_gaze"]), rel=1e-6
        )
        assert int(s_acc.step) == 1  # one optimizer update per N micros
        assert not np.allclose(np.asarray(s_acc.params["w"]), p0)


def test_accum_runs_with_augmentation_and_reduces_loss():
    model, metrics, tx, raw, fresh = _setup(batch=8)
    batch = {
        k: (v * 40 + 120).astype(np.uint8) if k.startswith("img") else v
        for k, v in raw.items()
    }
    step = jax.jit(
        make_train_step(model, metrics, tx, image_size=32, grad_accum=4),
        donate_argnums=(0,),
    )
    s = fresh()
    losses = []
    for i in range(8):
        s, st = step(s, batch, jax.random.PRNGKey(i))
        losses.append(float(st["loss_gaze"]))
        assert np.isfinite(losses[-1])
    assert int(s.step) == 8
    assert min(losses[4:]) < losses[0]


def test_accum_trainer_end_to_end(tmp_path):
    """Trainer with config.grad_accum trains and evals."""
    from types import SimpleNamespace

    from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
    from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset
    from rot_mvgaze_tpu.train import Trainer

    root = tmp_path / "data"
    root.mkdir()
    write_synthetic_dataset(str(root), ["s00.h5"], n_frames=2, image_size=32)
    ds = GazeDataset("xgaze", str(root), "bgr", ["s00.h5"], seed=0)
    cfg = SimpleNamespace(
        mode="train", exp_name="ga", output_dir=str(tmp_path / "logs"),
        ckpt_resume=None, print_freq=100, seed=0, batch_size=8,
        test_batch_size=8, epochs=1, save_epoch=10, image_size=32,
        scheduler_step="iteration", grad_accum=2,
    )
    trainer = Trainer(
        cfg,
        FeatRotationSymm(backbone_depth=18, num_iter=1),
        IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5),
        BatchLoader(ds, batch_size=8, shuffle=True, drop_last=True),
        BatchLoader(ds, batch_size=8),
    )
    trainer.train_one_epoch(0)
    assert np.isfinite(trainer.test(0))
