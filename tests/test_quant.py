"""int8 inference path (ops/quant.py, models.resnet.QuantConv).

The int8 path must (a) keep the param tree identical to the float model so
any checkpoint serves both, (b) stay numerically close to the float forward,
and (c) leave the training path untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.ops.quant import int8_conv, int8_dense, quantize_symmetric

SIZE = 64


def test_quantize_symmetric_reconstruction():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)
    q, s = quantize_symmetric(x)
    assert q.dtype == jnp.int8 and s.shape == ()
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * float(s), np.asarray(x),
        atol=float(s) / 2 + 1e-8,
    )
    # per-column scales
    q2, s2 = quantize_symmetric(x, reduce_axes=(0,))
    assert s2.shape == (1, 7)
    np.testing.assert_allclose(
        np.asarray(q2, np.float32) * np.asarray(s2), np.asarray(x),
        atol=float(np.max(s2)) / 2 + 1e-8,
    )


def test_int8_dense_matches_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    ref = x @ w + b
    out = int8_dense(x, w, b)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_conv_matches_f32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = int8_conv(x, w, (1, 1), [(1, 1), (1, 1)])
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


def _init_data(n=2):
    return {
        "img_0": jnp.zeros((n, SIZE, SIZE, 3), jnp.float32),
        "img_1": jnp.zeros((n, SIZE, SIZE, 3), jnp.float32),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
    }


def test_int8_model_shares_checkpoints_and_tracks_f32():
    f32_model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    int8_model = FeatRotationSymm(
        backbone_depth=18, num_iter=2, int8_backbone=True
    )
    variables = f32_model.init({"params": jax.random.PRNGKey(0)}, _init_data())

    # (a) identical param tree: the int8 model initializes the same tree
    v8 = int8_model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    assert jax.tree.structure(variables) == jax.tree.structure(v8)
    chex_shapes = jax.tree.map(lambda a, b: a.shape == b.shape, variables, v8)
    assert all(jax.tree.leaves(chex_shapes))

    rng = np.random.default_rng(3)
    data = {
        "img_0": jnp.asarray(rng.uniform(-2, 2, (4, SIZE, SIZE, 3)), jnp.float32),
        "img_1": jnp.asarray(rng.uniform(-2, 2, (4, SIZE, SIZE, 3)), jnp.float32),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
    }
    ref = f32_model.apply(variables, data, train=False)
    out = int8_model.apply(variables, data, train=False)

    # (b) backbone features stay close under per-layer int8 quantization
    rel = float(
        jnp.linalg.norm(out["img_feat_0"] - ref["img_feat_0"])
        / jnp.linalg.norm(ref["img_feat_0"])
    )
    assert rel < 0.2, rel
    # heads are small MLPs over those features in f32: predictions too
    assert float(
        jnp.max(jnp.abs(out["pred_gaze"] - ref["pred_gaze"]))
    ) < 0.25


def test_int8_model_train_path_is_exact_f32():
    """train=True must bypass quantization entirely."""
    f32_model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    int8_model = FeatRotationSymm(
        backbone_depth=18, num_iter=2, int8_backbone=True
    )
    variables = f32_model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    rng = np.random.default_rng(4)
    data = {
        "img_0": jnp.asarray(rng.uniform(-2, 2, (4, SIZE, SIZE, 3)), jnp.float32),
        "img_1": jnp.asarray(rng.uniform(-2, 2, (4, SIZE, SIZE, 3)), jnp.float32),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
    }
    ref, _ = f32_model.apply(
        variables, data, train=True, mutable=["batch_stats"]
    )
    out, _ = int8_model.apply(
        variables, data, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_array_equal(
        np.asarray(ref["pred_gaze"]), np.asarray(out["pred_gaze"])
    )
