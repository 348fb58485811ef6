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


def test_int8_static_calibrate_then_freeze():
    """static mode: calibration passes record ranges in the `quant`
    collection; frozen passes quantize with the stored scales and stay
    close to both the dynamic-int8 and f32 outputs."""
    f32_model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    s_model = FeatRotationSymm(
        backbone_depth=18, num_iter=2, int8_backbone="static"
    )
    variables = s_model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    assert "quant" in variables
    # params subtree identical to the plain model's (checkpoint compatible)
    v_plain = f32_model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        v_plain["params"]
    )
    # all ranges start at zero
    assert all(float(a) == 0.0 for a in jax.tree.leaves(variables["quant"]))

    rng = np.random.default_rng(5)
    data = {
        "img_0": jnp.asarray(rng.uniform(-2, 2, (4, SIZE, SIZE, 3)), jnp.float32),
        "img_1": jnp.asarray(rng.uniform(-2, 2, (4, SIZE, SIZE, 3)), jnp.float32),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
    }
    out_c, updates = s_model.apply(
        variables, data, train=False, mutable=["quant"]
    )
    assert all(float(a) > 0.0 for a in jax.tree.leaves(updates["quant"]))
    variables = {**variables, "quant": updates["quant"]}

    # frozen pass on the calibration data: no mutation, close to f32
    out_s = s_model.apply(variables, data, train=False)
    ref = f32_model.apply(variables, data, train=False)
    rel = float(
        jnp.linalg.norm(out_s["img_feat_0"] - ref["img_feat_0"])
        / jnp.linalg.norm(ref["img_feat_0"])
    )
    assert rel < 0.25, rel
    # calibration-pass output (dynamic quantization) also tracks f32
    assert float(jnp.max(jnp.abs(out_c["pred_gaze"] - ref["pred_gaze"]))) < 0.3


def test_gaze_predictor_static_int8(tmp_path):
    from rot_mvgaze_tpu.serving import GazePredictor
    from rot_mvgaze_tpu.train.checkpoints import save_state

    f32_model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    variables = f32_model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    ck = str(tmp_path / "m.msgpack")
    save_state(ck, dict(variables))

    p = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=4, image_size=SIZE,
        dtype=jnp.float32, int8="static",
    )
    rng = np.random.default_rng(6)
    req = (
        rng.integers(0, 256, (6, SIZE, SIZE, 3), dtype=np.uint8),
        rng.integers(0, 256, (6, SIZE, SIZE, 3), dtype=np.uint8),
        rng.uniform(-0.5, 0.5, (6, 2)).astype(np.float32),
        rng.uniform(-0.5, 0.5, (6, 2)).astype(np.float32),
    )
    first = p.predict(*req)  # auto-calibrates
    assert p._calibrated
    second = p.predict(*req)  # frozen static scales
    assert first.shape == second.shape == (6, 2)
    # both calibration-pass (dynamic) and frozen predictions track f32
    ref = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=4, image_size=SIZE,
        dtype=jnp.float32,
    ).predict(*req)
    assert np.max(np.abs(first - ref)) < 0.3
    assert np.max(np.abs(second - ref)) < 0.3

    # explicit calibrate() on a fresh predictor errors on non-static
    p_dyn = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=4, image_size=SIZE,
        dtype=jnp.float32, int8=True,
    )
    import pytest

    with pytest.raises(RuntimeError):
        p_dyn.calibrate(*req)


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


def test_int8_static_uncalibrated_fallback_is_sane():
    """Frozen static pass with an all-zero (never-calibrated) range must
    fall back to the conservative fixed scale, not clip to garbage."""
    f32_model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    s_model = FeatRotationSymm(
        backbone_depth=18, num_iter=2, int8_backbone="static"
    )
    variables = s_model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    rng = np.random.default_rng(7)
    data = {
        "img_0": jnp.asarray(rng.uniform(-2, 2, (4, SIZE, SIZE, 3)), jnp.float32),
        "img_1": jnp.asarray(rng.uniform(-2, 2, (4, SIZE, SIZE, 3)), jnp.float32),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
    }
    # frozen pass WITHOUT calibration: quant ranges are all zero
    out = s_model.apply(variables, data, train=False)
    ref = f32_model.apply(variables, data, train=False)
    assert np.all(np.isfinite(np.asarray(out["pred_gaze"])))
    # bounded degradation, not nonsense (fixed |8| range vs true ranges)
    assert float(jnp.max(jnp.abs(out["pred_gaze"] - ref["pred_gaze"]))) < 0.5


def test_reset_calibration_zeroes_ranges(tmp_path):
    from rot_mvgaze_tpu.serving import GazePredictor
    from rot_mvgaze_tpu.train.checkpoints import save_state

    model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    ck = str(tmp_path / "m.msgpack")
    save_state(ck, dict(variables))
    p = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=4, image_size=SIZE,
        dtype=jnp.float32, int8="static",
    )
    rng = np.random.default_rng(8)
    req = (
        rng.integers(0, 256, (4, SIZE, SIZE, 3), dtype=np.uint8),
        rng.integers(0, 256, (4, SIZE, SIZE, 3), dtype=np.uint8),
        np.zeros((4, 2), np.float32),
        np.zeros((4, 2), np.float32),
    )
    p.predict(*req)
    assert any(float(a) > 0 for a in jax.tree.leaves(p.variables["quant"]))
    p.reset_calibration()
    assert all(float(a) == 0 for a in jax.tree.leaves(p.variables["quant"]))
    assert not p._calibrated


def test_static_int8_predictor_on_mesh(tmp_path):
    """Data-parallel serving + static-int8 calibration must compose: the
    calibration pass updates quant state under the mesh and the frozen
    executable serves sharded micro-batches."""
    import jax

    if jax.device_count() < 2:
        import pytest

        pytest.skip("needs the virtual multi-device backend")
    from rot_mvgaze_tpu.parallel.mesh import make_mesh
    from rot_mvgaze_tpu.serving import GazePredictor
    from rot_mvgaze_tpu.train.checkpoints import save_state

    model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    ck = str(tmp_path / "m.msgpack")
    save_state(ck, dict(variables))

    mesh = make_mesh()
    p = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=8, image_size=SIZE,
        dtype=jnp.float32, int8="static", mesh=mesh,
    )
    rng = np.random.default_rng(9)
    req = (
        rng.integers(0, 256, (10, SIZE, SIZE, 3), dtype=np.uint8),
        rng.integers(0, 256, (10, SIZE, SIZE, 3), dtype=np.uint8),
        rng.uniform(-0.5, 0.5, (10, 2)).astype(np.float32),
        rng.uniform(-0.5, 0.5, (10, 2)).astype(np.float32),
    )
    first = p.predict(*req)   # calibration under the mesh
    second = p.predict(*req)  # frozen static scales, sharded micro-batches
    ref = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=8, image_size=SIZE,
        dtype=jnp.float32,
    ).predict(*req)
    assert first.shape == second.shape == (10, 2)
    assert np.max(np.abs(first - ref)) < 0.3
    assert np.max(np.abs(second - ref)) < 0.3


def test_warmup_compiles_without_polluting_calibration(tmp_path):
    from rot_mvgaze_tpu.serving import GazePredictor
    from rot_mvgaze_tpu.train.checkpoints import save_state

    model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    ck = str(tmp_path / "m.msgpack")
    save_state(ck, dict(variables))
    p = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=2, image_size=SIZE,
        dtype=jnp.float32, int8="static",
    )
    p.warmup()
    # both executables compiled, but ranges discarded and gate reopened
    assert not p._calibrated
    assert all(float(a) == 0 for a in jax.tree.leaves(p.variables["quant"]))
    # plain-mode warmup also works
    p2 = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=2, image_size=SIZE,
        dtype=jnp.float32,
    )
    p2.warmup()


def test_calibration_persistence_round_trip(tmp_path):
    from rot_mvgaze_tpu.serving import GazePredictor
    from rot_mvgaze_tpu.train.checkpoints import save_state

    model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, _init_data())
    ck = str(tmp_path / "m.msgpack")
    save_state(ck, dict(variables))
    cal = str(tmp_path / "ranges.msgpack")

    rng = np.random.default_rng(10)
    req = (
        rng.integers(0, 256, (4, SIZE, SIZE, 3), dtype=np.uint8),
        rng.integers(0, 256, (4, SIZE, SIZE, 3), dtype=np.uint8),
        np.zeros((4, 2), np.float32),
        np.zeros((4, 2), np.float32),
    )

    import os

    p1 = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=4, image_size=SIZE,
        dtype=jnp.float32, int8="static", calibration_path=cal,
    )
    # warmup must NOT write noise ranges to the file
    p1.warmup()
    assert not os.path.exists(cal)
    p1.predict(*req)  # real-data calibration -> auto-saved
    assert os.path.exists(cal)
    frozen1 = p1.predict(*req)

    # restart: ranges load, no calibration pass, identical frozen output
    p2 = GazePredictor(
        ck, backbone_depth=18, num_iter=2, micro_batch=4, image_size=SIZE,
        dtype=jnp.float32, int8="static", calibration_path=cal,
    )
    assert p2._calibrated
    np.testing.assert_array_equal(p2.predict(*req), frozen1)

    # wrong architecture rejected
    other = FeatRotationSymm(backbone_depth=50, num_iter=1)
    ck50 = str(tmp_path / "m50.msgpack")
    v50 = other.init({"params": jax.random.PRNGKey(0)}, _init_data())
    save_state(ck50, dict(v50))
    import pytest

    p3 = GazePredictor(
        ck50, backbone_depth=50, num_iter=1, micro_batch=4, image_size=SIZE,
        dtype=jnp.float32, int8="static",
    )
    with pytest.raises(ValueError, match="architecture"):
        p3.load_calibration(cal)
