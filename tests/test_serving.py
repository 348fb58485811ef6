"""Serving predictor + profiling/observability utility tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.serving import GazePredictor
from rot_mvgaze_tpu.train.checkpoints import save_state
from rot_mvgaze_tpu.utils import StepTimer, count_parameters


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    model = FeatRotationSymm(backbone_depth=18, num_iter=1)
    data = {
        "img_0": jnp.zeros((1, 32, 32, 3)),
        "img_1": jnp.zeros((1, 32, 32, 3)),
        "rot_0": jnp.eye(3)[None],
        "rot_1": jnp.eye(3)[None],
    }
    vs = model.init(jax.random.PRNGKey(0), data)
    path = str(tmp / "model.msgpack")
    save_state(path, dict(vs))
    return path


class TestGazePredictor:
    def test_predict_odd_sizes(self, ckpt_path):
        """Request sizes not divisible by the micro-batch get padded/sliced."""
        pred = GazePredictor(
            ckpt_path,
            backbone_depth=18,
            num_iter=1,
            micro_batch=4,
            image_size=32,
            dtype=jnp.float32,
        )
        rng = np.random.default_rng(0)
        n = 7  # 4 + 3: exercises both a full and a padded micro-batch
        img0 = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
        img1 = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
        hp0 = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
        hp1 = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
        out = pred.predict(img0, img1, hp0, hp1)
        assert out.shape == (n, 2)
        assert out.dtype == np.float32
        assert np.all(np.isfinite(out))
        # padding must not leak into real outputs: same result one-by-one
        single = np.concatenate(
            [
                pred.predict(img0[i : i + 1], img1[i : i + 1], hp0[i : i + 1], hp1[i : i + 1])
                for i in range(n)
            ]
        )
        np.testing.assert_allclose(out, single, atol=1e-5)

    def test_mesh_serving_matches_single_device(self, ckpt_path):
        """Data-parallel serving over the 8-device mesh: micro-batch rounded
        to a device multiple, outputs identical to single-device serving."""
        from rot_mvgaze_tpu.parallel.mesh import make_mesh

        kw = dict(
            backbone_depth=18, num_iter=1, image_size=32, dtype=jnp.float32
        )
        single = GazePredictor(ckpt_path, micro_batch=8, **kw)
        sharded = GazePredictor(
            ckpt_path, micro_batch=6, mesh=make_mesh(), **kw
        )
        assert sharded.micro_batch == 8  # rounded up to 8 devices
        rng = np.random.default_rng(1)
        n = 11
        args = (
            rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8),
            rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8),
            rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32),
            rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32),
        )
        np.testing.assert_allclose(
            sharded.predict(*args), single.predict(*args), atol=1e-5
        )

    def test_loads_torch_checkpoint(self, tmp_path):
        pytest.importorskip("torch")
        from reference_harness import reference_available

        if not reference_available():
            pytest.skip("reference unavailable")
        import torch

        from reference_harness import import_reference_models

        ref_rot_mv, _ = import_reference_models()
        torch.manual_seed(0)
        ref = ref_rot_mv.FeatRotationSymm(
            backbone_depth=18, num_iter=1,
            share_weights=False, encode_rotmat=False,
            share_feature=False, ignore_rotmat=False,
        )
        path = str(tmp_path / "ref.pth.tar")
        torch.save(ref.state_dict(), path)
        pred = GazePredictor(
            path, backbone_depth=18, num_iter=1, micro_batch=2,
            image_size=32, dtype=jnp.float32,
        )
        rng = np.random.default_rng(0)
        out = pred.predict(
            rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8),
            rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8),
            rng.uniform(-0.5, 0.5, (2, 2)).astype(np.float32),
            rng.uniform(-0.5, 0.5, (2, 2)).astype(np.float32),
        )
        assert out.shape == (2, 2) and np.all(np.isfinite(out))


class TestBatchingPredictor:
    def test_concurrent_requests_coalesce_and_match(self, ckpt_path):
        """Concurrent callers through the dynamic batcher get exactly what a
        direct predict would return, row for row."""
        import threading

        from rot_mvgaze_tpu.serving import BatchingPredictor

        inner = GazePredictor(
            ckpt_path, backbone_depth=18, num_iter=1, micro_batch=8,
            image_size=32, dtype=jnp.float32,
        )
        batcher = BatchingPredictor(inner, max_delay_ms=20.0)
        rng = np.random.default_rng(2)
        reqs = []
        for n in (3, 2, 5, 1, 4):
            reqs.append(
                (
                    rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8),
                    rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8),
                    rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32),
                    rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32),
                )
            )
        results = [None] * len(reqs)

        def call(i):
            results[i] = batcher.predict(*reqs[i])

        threads = [
            threading.Thread(target=call, args=(i,)) for i in range(len(reqs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i, req in enumerate(reqs):
            want = inner.predict(*req)
            np.testing.assert_allclose(results[i], want, atol=1e-5, err_msg=i)
        batcher.close()

    def test_empty_request_and_close(self, ckpt_path):
        from rot_mvgaze_tpu.serving import BatchingPredictor

        inner = GazePredictor(
            ckpt_path, backbone_depth=18, num_iter=1, micro_batch=4,
            image_size=32, dtype=jnp.float32,
        )
        batcher = BatchingPredictor(inner)
        assert batcher.predict(
            np.zeros((0, 32, 32, 3), np.uint8),
            np.zeros((0, 32, 32, 3), np.uint8),
            np.zeros((0, 2), np.float32),
            np.zeros((0, 2), np.float32),
        ).shape == (0, 2)
        batcher.close()
        with pytest.raises(RuntimeError):
            batcher.predict(
                np.zeros((1, 32, 32, 3), np.uint8),
                np.zeros((1, 32, 32, 3), np.uint8),
                np.zeros((1, 2), np.float32),
                np.zeros((1, 2), np.float32),
            )

    def test_error_propagates_to_caller(self, ckpt_path):
        from rot_mvgaze_tpu.serving import BatchingPredictor

        inner = GazePredictor(
            ckpt_path, backbone_depth=18, num_iter=1, micro_batch=4,
            image_size=32, dtype=jnp.float32,
        )
        batcher = BatchingPredictor(inner)
        with pytest.raises(Exception):
            # rank-3 images (missing channel axis) -> the forward rejects
            # them; the error must surface in the CALLING thread, not kill
            # the dispatcher
            batcher.predict(
                np.zeros((2, 32, 32), np.uint8),
                np.zeros((2, 32, 32), np.uint8),
                np.zeros((2, 2), np.float32),
                np.zeros((2, 2), np.float32),
            )
        # dispatcher survives and still serves good requests
        out = batcher.predict(
            np.zeros((1, 32, 32, 3), np.uint8),
            np.zeros((1, 32, 32, 3), np.uint8),
            np.zeros((1, 2), np.float32),
            np.zeros((1, 2), np.float32),
        )
        assert out.shape == (1, 2)
        batcher.close()


class TestProfilingUtils:
    def test_step_timer(self):
        t = StepTimer(items_per_step=10)
        x = jnp.ones((8, 8))
        t.start()
        y = x @ x
        dt = t.stop(y)
        assert dt > 0
        assert t.items_per_second > 0

    def test_count_parameters(self):
        params = {"a": {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}}
        assert count_parameters(params) == 16


def test_batching_predictor_rejects_non_uint8(ckpt_path):
    """Float images must fail in the caller's thread, not be coalesced into
    strangers' uint8 batches (dtype is not part of the coalescing shape key;
    a promoted batch would retrace the executable and double-normalize the
    float caller's pixels)."""
    from rot_mvgaze_tpu.serving import BatchingPredictor

    inner = GazePredictor(
        ckpt_path, backbone_depth=18, num_iter=1, micro_batch=4,
        image_size=32, dtype=jnp.float32,
    )
    bp = BatchingPredictor(inner, max_delay_ms=5.0)
    try:
        bad = np.zeros((1, 32, 32, 3), np.float32)
        hp = np.zeros((1, 2), np.float32)
        with pytest.raises(ValueError, match="uint8"):
            bp.predict(bad, bad, hp, hp)
    finally:
        bp.close()


def test_gaze_predictor_validates_requests(ckpt_path):
    """Direct GazePredictor.predict must reject malformed requests instead
    of silently producing garbage (r4 review batch 4): float images would be
    /255'd a second time on device, and a short head-pose array would be
    silently padded with fabricated poses."""
    pred = GazePredictor(
        ckpt_path, backbone_depth=18, num_iter=1, micro_batch=4,
        image_size=32, dtype=jnp.float32,
    )
    img = np.zeros((2, 32, 32, 3), np.uint8)
    hp = np.zeros((2, 2), np.float32)
    # float pixels (ToTensor-style, already [0,1]) -> double normalization
    with pytest.raises(ValueError, match="uint8"):
        pred.predict(img.astype(np.float32) / 255.0, img, hp, hp)
    # mismatched batch dims across fields
    with pytest.raises(ValueError, match="batch dimension"):
        pred.predict(img, img[:1], hp, hp)
    with pytest.raises(ValueError, match="head_pose_0"):
        pred.predict(img, img, hp[:1], hp)
    # wrong rank / channel count
    with pytest.raises(ValueError, match="N, H, W, 3"):
        pred.predict(img[..., :2], img[..., :2], hp, hp)
    # calibrate() shares the same validation (static-int8 only, but the
    # dtype rule is identical) -- non-static predictors reject earlier
    with pytest.raises(RuntimeError, match="static"):
        pred.calibrate(img, img, hp, hp)


def test_batching_predictor_rejects_off_resolution(ckpt_path):
    """An off-resolution request would recompile a fresh executable inside
    the single dispatcher thread, stalling every coalesced caller behind it
    -- reject it in the caller's own thread (r4 review batch 4)."""
    from rot_mvgaze_tpu.serving import BatchingPredictor

    inner = GazePredictor(
        ckpt_path, backbone_depth=18, num_iter=1, micro_batch=4,
        image_size=32, dtype=jnp.float32,
    )
    bp = BatchingPredictor(inner, max_delay_ms=5.0)
    try:
        bad = np.zeros((1, 64, 64, 3), np.uint8)
        hp = np.zeros((1, 2), np.float32)
        with pytest.raises(ValueError, match="fixed-shape"):
            bp.predict(bad, bad, hp, hp)
    finally:
        bp.close()


def test_calibration_path_requires_static_int8(ckpt_path):
    """calibration_path is only read/written on the static-int8 path;
    accepting it elsewhere lets the user believe activation ranges are
    persisted while nothing happens (r4 review batch 4)."""
    with pytest.raises(ValueError, match="calibration_path"):
        GazePredictor(
            ckpt_path, backbone_depth=18, num_iter=1, image_size=32,
            int8=True, calibration_path="ranges.msgpack",
        )


def test_uint8_head_poses_cast_to_float32(ckpt_path):
    """Pose dtype coercion is keyed on RANK, not dtype (r4 review batch 11):
    a uint8 pose array must reach the compiled forward as float32 — unsigned
    arithmetic would wrap its negated pitch (1 -> 255) inside
    rotation_matrix_2d, producing silently wrong rotations, and the odd
    dtype would compile a second executable inside the dispatcher thread."""
    pred = GazePredictor(
        ckpt_path, backbone_depth=18, num_iter=1, micro_batch=4,
        image_size=32, dtype=jnp.float32,
    )
    rng = np.random.default_rng(3)
    img0 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    img1 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    hp_u8 = np.array([[1, 0], [0, 1]], np.uint8)  # wraps to 255 if negated
    hp_f32 = hp_u8.astype(np.float32)
    np.testing.assert_allclose(
        pred.predict(img0, img1, hp_u8, hp_u8),
        pred.predict(img0, img1, hp_f32, hp_f32),
        atol=1e-6,
    )


def test_calibrate_empty_batch_raises_without_freezing(ckpt_path):
    """calibrate() on an empty batch used to mark the predictor calibrated
    BEFORE crashing in np.concatenate, freezing all-zero activation ranges
    for the life of the process (r4 review batch 11). Now: loud error,
    calibration state untouched, the next real request auto-calibrates."""
    pred = GazePredictor(
        ckpt_path, backbone_depth=18, num_iter=1, micro_batch=4,
        image_size=32, dtype=jnp.float32, int8="static",
    )
    img = np.zeros((0, 32, 32, 3), np.uint8)
    hp = np.zeros((0, 2), np.float32)
    with pytest.raises(ValueError, match="at least 1 sample"):
        pred.calibrate(img, img, hp, hp)
    assert not pred._calibrated
    rng = np.random.default_rng(4)
    full = (
        rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8),
        rng.uniform(-0.5, 0.5, (4, 2)).astype(np.float32),
        rng.uniform(-0.5, 0.5, (4, 2)).astype(np.float32),
    )
    out = pred.predict(*full)  # auto-calibrates from real data
    assert pred._calibrated
    assert out.shape == (4, 2) and np.all(np.isfinite(out))
    # the frozen scales are real, not the zeroed placeholder: a quant leaf
    # recorded a non-zero activation range
    ranges = jax.tree.leaves(pred.variables["quant"])
    assert any(float(jnp.max(jnp.abs(r))) > 0 for r in ranges)


def test_batching_predictor_error_names_client_dtype(ckpt_path):
    """The rejection must name the dtype the client actually sent: a
    pre-validation float32 cast used to report float64 images as float32,
    sending the client debugging the wrong conversion (r4 review batch 11)."""
    from rot_mvgaze_tpu.serving import BatchingPredictor

    inner = GazePredictor(
        ckpt_path, backbone_depth=18, num_iter=1, micro_batch=4,
        image_size=32, dtype=jnp.float32,
    )
    bp = BatchingPredictor(inner, max_delay_ms=5.0)
    try:
        bad = np.zeros((1, 32, 32, 3), np.float64)
        hp = np.zeros((1, 2), np.float32)
        with pytest.raises(ValueError, match="float64"):
            bp.predict(bad, bad, hp, hp)
    finally:
        bp.close()
