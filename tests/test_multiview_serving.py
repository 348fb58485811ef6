"""MultiViewGazePredictor: serving/export surface for the V-view model.

The reference has no serving tier at all; our stereo serving stack
(rot_mvgaze_tpu.serving, tests/test_serving.py) is oracle-verified against
the reference forward. These tests pin the V-view predictor to that stack:
at V=2 the stacked predictor must agree with the stereo GazePredictor on
the SAME checkpoint (the serving-level form of the model's bit-exact
reduction, tests/test_multiview.py), and the shared machinery
(micro-batch padding, DP meshes, dynamic coalescing, static-int8
calibration, AOT export) must behave identically to its stereo twin.
"""

import io
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.serving import (
    BatchingPredictor,
    GazePredictor,
    MultiViewGazePredictor,
)
from rot_mvgaze_tpu.train.checkpoints import save_state

S = 32


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    """A stereo checkpoint — the SAME file must load at any V (the V-view
    param tree is the stereo tree by construction)."""
    tmp = tmp_path_factory.mktemp("mv_serve")
    model = FeatRotationSymm(backbone_depth=18, num_iter=1)
    data = {
        "img_0": jnp.zeros((1, S, S, 3)),
        "img_1": jnp.zeros((1, S, S, 3)),
        "rot_0": jnp.eye(3)[None],
        "rot_1": jnp.eye(3)[None],
    }
    vs = model.init(jax.random.PRNGKey(0), data)
    path = str(tmp / "model.msgpack")
    save_state(path, dict(vs))
    return path


def _request(n, v, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n, v, S, S, 3), dtype=np.uint8)
    poses = rng.uniform(-0.5, 0.5, (n, v, 2)).astype(np.float32)
    return imgs, poses


def _mv(ckpt_path, v=3, **kw):
    kw.setdefault("micro_batch", 4)
    kw.setdefault("image_size", S)
    kw.setdefault("dtype", jnp.float32)
    return MultiViewGazePredictor(
        ckpt_path, num_views=v, backbone_depth=18, num_iter=1, **kw
    )


class TestMultiViewGazePredictor:
    def test_v2_stacked_matches_stereo_predictor(self, ckpt_path):
        """The serving-level reduction: the stacked V=2 predictor and the
        stereo predictor agree on the same checkpoint and pixels."""
        stereo = GazePredictor(
            ckpt_path, backbone_depth=18, num_iter=1,
            micro_batch=4, image_size=S, dtype=jnp.float32,
        )
        mv = _mv(ckpt_path, v=2)
        imgs, poses = _request(5, 2)
        out_mv = mv.predict(imgs, poses)
        out_st = stereo.predict(
            imgs[:, 0], imgs[:, 1], poses[:, 0], poses[:, 1]
        )
        np.testing.assert_allclose(out_mv, out_st, atol=1e-5)

    def test_padding_does_not_leak(self, ckpt_path):
        """Odd request sizes pad the last micro-batch; results must equal
        one-by-one serving (V=3: zero-shot multiview from a stereo ckpt)."""
        mv = _mv(ckpt_path, v=3)
        imgs, poses = _request(7, 3, seed=1)
        out = mv.predict(imgs, poses)
        assert out.shape == (7, 2) and out.dtype == np.float32
        assert np.all(np.isfinite(out))
        single = np.concatenate(
            [
                mv.predict(imgs[i : i + 1], poses[i : i + 1])
                for i in range(7)
            ]
        )
        np.testing.assert_allclose(out, single, atol=1e-5)
        assert mv.predict(imgs[:0], poses[:0]).shape == (0, 2)

    def test_request_validation(self, ckpt_path):
        mv = _mv(ckpt_path, v=3)
        imgs, poses = _request(2, 3)
        with pytest.raises(ValueError, match="3-view|views"):
            mv.predict(imgs[:, :2], poses[:, :2])  # wrong V
        with pytest.raises(ValueError, match="uint8"):
            mv.predict(imgs.astype(np.float32), poses)
        with pytest.raises(ValueError, match="head_poses"):
            mv.predict(imgs, poses[:, :, :1])
        with pytest.raises(ValueError, match="uint8|\\(N"):
            mv.predict(imgs[0], poses)  # rank-4 imgs
        with pytest.raises(ValueError, match="num_views must be >= 2"):
            _mv(ckpt_path, v=1)

    def test_mesh_dp_matches_single_device(self, ckpt_path):
        from rot_mvgaze_tpu.parallel.mesh import make_mesh

        single = _mv(ckpt_path, v=3, micro_batch=8)
        sharded = _mv(ckpt_path, v=3, micro_batch=6, mesh=make_mesh())
        assert sharded.micro_batch == 8  # rounded up to 8 devices
        imgs, poses = _request(11, 3, seed=2)
        np.testing.assert_allclose(
            sharded.predict(imgs, poses),
            single.predict(imgs, poses),
            atol=1e-5,
        )

    def test_spatial_mesh_rejected(self, ckpt_path):
        from rot_mvgaze_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError, match="spatial"):
            _mv(ckpt_path, v=3, mesh=make_mesh(spatial=2))

    def test_batching_predictor_coalesces_multiview(self, ckpt_path):
        mv = _mv(ckpt_path, v=3)
        imgs, poses = _request(6, 3, seed=3)
        direct = mv.predict(imgs, poses)
        batched = BatchingPredictor(mv, max_delay_ms=20.0)
        try:
            outs = [None] * 3
            errs = []

            def call(i):
                try:
                    outs[i] = batched.predict(
                        imgs[2 * i : 2 * i + 2], poses[2 * i : 2 * i + 2]
                    )
                except Exception as e:  # pragma: no cover
                    errs.append(e)

            threads = [
                threading.Thread(target=call, args=(i,)) for i in range(3)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            assert not errs
            for i in range(3):
                np.testing.assert_allclose(
                    outs[i], direct[2 * i : 2 * i + 2], atol=1e-5
                )
            # malformed request fails in ITS caller, arity enforced
            with pytest.raises(ValueError, match="views|uint8"):
                batched.predict(imgs.astype(np.float32), poses)
            with pytest.raises(ValueError, match="2 arrays"):
                batched.predict(imgs, poses, poses)
        finally:
            batched.close()

    def test_int8_static_calibrates_and_serves(self, ckpt_path):
        mv = _mv(ckpt_path, v=3, int8="static")
        imgs, poses = _request(4, 3, seed=4)
        with pytest.warns(UserWarning, match="auto-calibration"):
            out = mv.predict(imgs, poses)
        assert out.shape == (4, 2) and np.all(np.isfinite(out))
        assert mv._calibrated
        # frozen-scale path serves deterministically after calibration
        out2 = mv.predict(imgs, poses)
        out3 = mv.predict(imgs, poses)
        np.testing.assert_array_equal(out2, out3)

    def test_warmup_compiles_without_polluting_calibration(self, ckpt_path):
        mv = _mv(ckpt_path, v=3, int8="static")
        mv.warmup()
        assert not mv._calibrated  # noise calibration discarded
        quant = jax.tree.leaves(mv.variables["quant"])
        assert all(float(jnp.max(jnp.abs(q))) == 0.0 for q in quant)


class TestMultiViewExport:
    def test_aot_roundtrip_matches_live_predictor(self, ckpt_path, tmp_path):
        from rot_mvgaze_tpu.export import (
            AotGazePredictor,
            export_serving_artifact,
        )

        mv = _mv(ckpt_path, v=3)
        path = str(tmp_path / "mv.stablehlo")
        export_serving_artifact(
            mv.model,
            mv.variables,
            path,
            micro_batch=4,
            image_size=S,
            num_views=3,
        )
        aot = AotGazePredictor(path, ckpt_path)
        assert aot.num_views == 3
        assert aot.n_request == 2
        assert aot.micro_batch == 4 and aot.image_size == S
        imgs, poses = _request(5, 3, seed=5)
        np.testing.assert_allclose(
            aot.predict(imgs, poses), mv.predict(imgs, poses), atol=1e-5
        )
        # arity is validated against the artifact's request shape
        with pytest.raises(ValueError, match="3-view"):
            aot.predict(imgs[:, 0], imgs[:, 1], poses[:, 0], poses[:, 1])

    def test_export_requires_num_views_for_multiview(self, ckpt_path):
        from rot_mvgaze_tpu.export import export_serving_artifact

        mv = _mv(ckpt_path, v=3)
        with pytest.raises(ValueError, match="num_views"):
            export_serving_artifact(
                mv.model, mv.variables, "/dev/null", micro_batch=2,
                image_size=S,
            )
        # and rejects num_views on a stereo model
        stereo = GazePredictor(
            ckpt_path, backbone_depth=18, num_iter=1,
            micro_batch=2, image_size=S, dtype=jnp.float32,
        )
        with pytest.raises(ValueError, match="num_views"):
            export_serving_artifact(
                stereo.model, stereo.variables, "/dev/null", micro_batch=2,
                image_size=S, num_views=3,
            )
