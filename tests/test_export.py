"""AOT export (rot_mvgaze_tpu/export.py): serialized artifact round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.export import (
    AotGazePredictor,
    export_serving_artifact,
    load_serving_artifact,
)
from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.serving import make_serving_forward
from rot_mvgaze_tpu.train.checkpoints import save_state

SIZE = 64
MB = 4


@pytest.fixture(scope="module")
def small_model_and_vars():
    model = FeatRotationSymm(backbone_depth=18, num_iter=2)
    init_data = {
        "img_0": jnp.zeros((2, SIZE, SIZE, 3), jnp.float32),
        "img_1": jnp.zeros((2, SIZE, SIZE, 3), jnp.float32),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, init_data)
    return model, variables


def _request(n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 256, (n, SIZE, SIZE, 3), dtype=np.uint8),
        rng.integers(0, 256, (n, SIZE, SIZE, 3), dtype=np.uint8),
        rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32),
        rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32),
    )


def test_export_round_trip(tmp_path, small_model_and_vars):
    model, variables = small_model_and_vars
    path = str(tmp_path / "serving.stablehlo")
    exported = export_serving_artifact(
        model, variables, path, micro_batch=MB, image_size=SIZE
    )
    assert exported.in_avals[-4].shape == (MB, SIZE, SIZE, 3)

    loaded = load_serving_artifact(path)
    args = _request(MB)
    direct = make_serving_forward(model, SIZE)(variables, *args)
    via_artifact = jax.jit(loaded.call)(variables, *args)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(via_artifact), atol=1e-5
    )


def test_aot_predictor_ragged_request(tmp_path, small_model_and_vars):
    model, variables = small_model_and_vars
    artifact = str(tmp_path / "serving.stablehlo")
    ckpt = str(tmp_path / "model.msgpack")
    export_serving_artifact(
        model, variables, artifact, micro_batch=MB, image_size=SIZE
    )
    save_state(ckpt, dict(variables))

    predictor = AotGazePredictor(artifact, ckpt)
    assert predictor.micro_batch == MB
    assert predictor.image_size == SIZE

    # ragged: 2 full micro-batches + padded remainder of 2
    n = 2 * MB + 2
    args = _request(n, seed=1)
    pred = predictor.predict(*args)
    assert pred.shape == (n, 2)
    direct = np.asarray(make_serving_forward(model, SIZE)(variables, *args))
    np.testing.assert_allclose(pred, direct, atol=1e-5)

    # empty request short-circuits
    assert predictor.predict(*_request(0)).shape == (0, 2)


def test_aot_predictor_torch_checkpoint_via_sidecar(tmp_path, small_model_and_vars):
    """The metadata sidecar written next to the artifact lets the AOT
    loader convert a reference .pth.tar without being told the config."""
    import json

    import torch

    from rot_mvgaze_tpu.compat import flax_to_torch_state_dict

    model, variables = small_model_and_vars
    artifact = str(tmp_path / "serving.stablehlo")
    export_serving_artifact(
        model, variables, artifact, micro_batch=MB, image_size=SIZE
    )
    with open(artifact + ".json") as f:
        meta = json.load(f)
    assert meta["backbone_depth"] == 18 and meta["num_iter"] == 2
    assert meta["micro_batch"] == MB and meta["image_size"] == SIZE

    sd = flax_to_torch_state_dict(
        variables, backbone_depth=18, num_iter=2
    )
    pth = str(tmp_path / "ref.pth.tar")
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, pth)

    predictor = AotGazePredictor(artifact, pth)
    args = _request(MB, seed=2)
    pred = predictor.predict(*args)
    direct = np.asarray(make_serving_forward(model, SIZE)(variables, *args))
    np.testing.assert_allclose(pred, direct, atol=1e-4)

    # torch checkpoint without a sidecar is a clean error
    import os

    os.rename(artifact + ".json", artifact + ".json.bak")
    with pytest.raises(FileNotFoundError):
        AotGazePredictor(artifact, pth)


def test_static_int8_export_rejected(tmp_path, small_model_and_vars):
    """Static-int8 calibration state is live-serving-only; exporting it
    would produce an unloadable artifact — must fail loudly."""
    _, variables = small_model_and_vars
    model = FeatRotationSymm(
        backbone_depth=18, num_iter=2, int8_backbone="static"
    )
    with pytest.raises(ValueError, match="static-int8"):
        export_serving_artifact(
            model, dict(variables), str(tmp_path / "x.stablehlo"),
            micro_batch=MB, image_size=SIZE,
        )
    # the quant collection itself also trips the guard
    with pytest.raises(ValueError, match="static-int8"):
        export_serving_artifact(
            FeatRotationSymm(backbone_depth=18, num_iter=2),
            {**variables, "quant": {}},
            str(tmp_path / "y.stablehlo"), micro_batch=MB, image_size=SIZE,
        )


def test_aot_predictor_accepts_uint8_head_poses(tmp_path, small_model_and_vars):
    """Pose coercion is keyed on RANK, not dtype (r4 review batch 11): a
    uint8 pose must be cast to float32 before exported.call — the exported
    avals are exact, so it would otherwise raise a deep jax.export
    aval-mismatch error on a request the live predictor serves fine."""
    model, variables = small_model_and_vars
    artifact = str(tmp_path / "serving.stablehlo")
    ckpt = str(tmp_path / "model.msgpack")
    export_serving_artifact(
        model, variables, artifact, micro_batch=MB, image_size=SIZE
    )
    save_state(ckpt, dict(variables))
    predictor = AotGazePredictor(artifact, ckpt)
    img0, img1, _, _ = _request(MB, seed=2)
    hp_u8 = np.zeros((MB, 2), np.uint8)
    hp_u8[:, 0] = 1  # would wrap to 255 under unsigned negation
    np.testing.assert_allclose(
        predictor.predict(img0, img1, hp_u8, hp_u8),
        predictor.predict(img0, img1, hp_u8.astype(np.float32),
                          hp_u8.astype(np.float32)),
        atol=1e-6,
    )
