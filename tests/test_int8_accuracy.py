"""int8 serving accuracy gate (VERDICT r2 weak #5 / item #6).

The shipped serving fast path is R50 int8-static (calibrated activation
scales, docs/SERVING.md). This pins its accuracy cost NUMERICALLY, in two
layers:

1. **Component gate (tight, transferable).** The quantized component is the
   backbone; its int8 feature error vs f32 is budgeted directly at the
   shipped R50 depth: mean relative L2 <= 5%, cosine similarity >= 0.999.
   Measured 2.4% / 0.99976 on this fixture — and the same 2% on R18, i.e.
   the machinery's noise does NOT blow up with depth.

2. **End-to-end tripwire (fixture-calibrated).** Mean angular divergence
   int8-vs-f32 and the protocol-metric shift |mean_err(int8)-mean_err(f32)|
   (/root/reference/trainer.py:192) on a fixed synthetic eval set, budgeted
   at the measured level + margin. IMPORTANT CAVEAT (documented in
   docs/SERVING.md): this fixture's fusion MLPs are random-init, which
   AMPLIFIES the ~2% backbone noise ~20x into degrees (measured ~6 deg
   divergence / ~1.7 deg shift); a trained checkpoint's smooth fusion heads
   do not do this (R18 trained-probe divergence was ~0.3 deg). The tripwire
   exists to catch REGRESSIONS of the quantization path, not to claim an
   absolute serving accuracy — that claim lives in the component gate.

The fixture adapts BN running stats to the data (forward passes only, no
weight updates) so eval-mode activations are normalized; a raw random-init
R50 has exploding activations (pred norm ~8.7 rad) that no served model has.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.augment.ops import eval_preprocess
from rot_mvgaze_tpu.geometry import angular_error_numpy
from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.models.resnet import resnet50
from rot_mvgaze_tpu.serving import GazePredictor
from rot_mvgaze_tpu.train.checkpoints import save_state

IMAGE_SIZE = 64
N_EVAL = 32

# component gate (the quantized backbone itself)
FEATURE_REL_ERR_BUDGET = 0.05
FEATURE_COS_BUDGET = 0.999

# end-to-end tripwires on THIS fixture (see module docstring caveat):
# measured divergence ~6.1 deg / shift ~1.7 deg with random-init fusers
E2E_DIVERGENCE_TRIPWIRE_DEG = 10.0
E2E_METRIC_SHIFT_TRIPWIRE_DEG = 3.0


@pytest.fixture(scope="module")
def eval_set():
    rng = np.random.default_rng(7)
    return {
        "i0": rng.integers(0, 256, (N_EVAL, IMAGE_SIZE, IMAGE_SIZE, 3),
                           dtype=np.uint8),
        "i1": rng.integers(0, 256, (N_EVAL, IMAGE_SIZE, IMAGE_SIZE, 3),
                           dtype=np.uint8),
        "h0": rng.uniform(-0.8, 0.8, (N_EVAL, 2)).astype(np.float32),
        "h1": rng.uniform(-0.8, 0.8, (N_EVAL, 2)).astype(np.float32),
        "gt": rng.uniform(-0.7, 0.7, (N_EVAL, 2)).astype(np.float64),
    }


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory, eval_set):
    """R50 with BN running stats adapted to the eval distribution (forward
    passes with mutable batch_stats; params untouched)."""
    tmp = tmp_path_factory.mktemp("int8_gate")
    model = FeatRotationSymm(backbone_depth=50, num_iter=3)
    init_data = {
        "img_0": jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3)),
        "img_1": jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3)),
        "rot_0": jnp.eye(3)[None],
        "rot_1": jnp.eye(3)[None],
    }
    variables = dict(model.init(jax.random.PRNGKey(0), init_data))

    @jax.jit
    def adapt(variables, i0, i1):
        n = i0.shape[0]
        data = {
            "img_0": eval_preprocess(i0, IMAGE_SIZE),
            "img_1": eval_preprocess(i1, IMAGE_SIZE),
            "rot_0": jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
            "rot_1": jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
        }
        _, upd = model.apply(variables, data, train=True,
                             mutable=["batch_stats"])
        return upd["batch_stats"]

    for _ in range(20):
        variables["batch_stats"] = adapt(
            variables, eval_set["i0"], eval_set["i1"]
        )
    path = str(tmp / "r50.msgpack")
    save_state(path, {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables["batch_stats"]),
    })
    return path


def test_backbone_int8_feature_budget():
    """Component gate: int8 R50 backbone features vs f32."""
    m_f32 = resnet50()
    vs = m_f32.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3)))
    rng = np.random.default_rng(7)
    x = eval_preprocess(
        jnp.asarray(rng.integers(0, 256, (16, IMAGE_SIZE, IMAGE_SIZE, 3),
                                 dtype=np.uint8)),
        IMAGE_SIZE,
    )
    f = np.asarray(m_f32.apply(vs, x, train=False), np.float64)
    q = np.asarray(resnet50(int8=True).apply(vs, x, train=False), np.float64)
    rel = np.linalg.norm(q - f, axis=1) / np.linalg.norm(f, axis=1)
    cos = (f * q).sum(1) / (
        np.linalg.norm(f, axis=1) * np.linalg.norm(q, axis=1)
    )
    print(f"backbone int8: rel_err mean={rel.mean():.5f} "
          f"max={rel.max():.5f} cos={cos.mean():.6f}")
    assert rel.mean() <= FEATURE_REL_ERR_BUDGET
    assert cos.mean() >= FEATURE_COS_BUDGET


def test_r50_int8_static_e2e_tripwire(ckpt, eval_set):
    """End-to-end R50 int8-static vs f32: divergence + protocol-metric
    shift under the documented fixture budgets."""
    preds = {}
    for mode in (False, "static"):
        pred = GazePredictor(
            ckpt, backbone_depth=50, num_iter=3, micro_batch=16,
            image_size=IMAGE_SIZE, dtype=jnp.float32, int8=mode,
        )
        if mode == "static":
            h = N_EVAL // 2
            pred.calibrate(
                eval_set["i0"][:h], eval_set["i1"][:h],
                eval_set["h0"][:h], eval_set["h1"][:h],
            )
        preds[mode] = pred.predict(
            eval_set["i0"], eval_set["i1"], eval_set["h0"], eval_set["h1"]
        ).astype(np.float64)

    f32, q = preds[False], preds["static"]
    assert np.isfinite(q).all()
    divergence = float(np.mean(angular_error_numpy(q, f32)))
    err_f32 = float(np.mean(angular_error_numpy(f32, eval_set["gt"])))
    err_q = float(np.mean(angular_error_numpy(q, eval_set["gt"])))
    shift = abs(err_q - err_f32)
    print(f"R50 int8-static e2e: divergence {divergence:.4f} deg, "
          f"metric shift {shift:.4f} deg "
          f"(f32 {err_f32:.4f}, int8 {err_q:.4f})")
    assert divergence <= E2E_DIVERGENCE_TRIPWIRE_DEG
    assert shift <= E2E_METRIC_SHIFT_TRIPWIRE_DEG
