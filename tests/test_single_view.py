"""Single-view gaze baseline tests (BASELINE.json config #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
from rot_mvgaze_tpu.data.synthetic import write_synthetic_h5
from rot_mvgaze_tpu.evaluate import evaluate_gaze
from rot_mvgaze_tpu.losses import gaze_angular_loss
from rot_mvgaze_tpu.models import SingleViewGazeNet


class TestSingleViewGazeNet:
    def test_raw_batch_interface(self):
        m = SingleViewGazeNet(backbone_depth=18)
        x = jnp.zeros((2, 32, 32, 3))
        vs = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(vs, x)
        assert out.shape == (2, 2)

    def test_dict_interface(self):
        m = SingleViewGazeNet(backbone_depth=18)
        data = {"img_0": jnp.zeros((2, 32, 32, 3)), "gt_gaze": jnp.zeros((2, 2))}
        vs = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(vs, data)
        assert out["pred_gaze"].shape == (2, 2)
        assert out["img_feat_0"].shape == (2, 512)
        assert "gt_gaze" in out

    def test_trains(self):
        m = SingleViewGazeNet(backbone_depth=18)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        y = jax.random.uniform(jax.random.PRNGKey(1), (4, 2), minval=-1, maxval=1)
        vs = m.init(jax.random.PRNGKey(2), x)

        def loss(p):
            pred = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, train=True,
                mutable=["batch_stats"],
            )[0]
            return gaze_angular_loss(pred, y)

        g = jax.grad(loss)(vs["params"])
        assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))


class TestEvaluateGaze:
    def test_single_view_eval_protocol(self, tmp_path):
        write_synthetic_h5(str(tmp_path / "s.h5"), n_frames=2, image_size=32)
        ds = GazeDataset("xgaze", str(tmp_path), "bgr", ["s.h5"], stereo=False)
        loader = BatchLoader(ds, batch_size=12)
        m = SingleViewGazeNet(backbone_depth=18)
        vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        err = evaluate_gaze(m, vs, loader, image_size=32, single_view=True)
        assert np.isfinite(err) and 0 < err < 180

    def test_two_view_eval_protocol(self, tmp_path):
        """evaluate_gaze over the stereo FeatRotationSymm matches the
        Trainer.test metric on the same data + params."""
        from types import SimpleNamespace

        from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset
        from rot_mvgaze_tpu.models import FeatRotationSymm
        from rot_mvgaze_tpu.train import Trainer

        write_synthetic_dataset(str(tmp_path), ["s.h5"], n_frames=2,
                                image_size=32)
        ds = GazeDataset("xgaze", str(tmp_path), "bgr", ["s.h5"], seed=0)
        loader = BatchLoader(ds, batch_size=12)
        m = FeatRotationSymm(backbone_depth=18, num_iter=1)
        data = {
            "img_0": jnp.zeros((1, 32, 32, 3)),
            "img_1": jnp.zeros((1, 32, 32, 3)),
            "rot_0": jnp.eye(3)[None],
            "rot_1": jnp.eye(3)[None],
        }
        vs = m.init(jax.random.PRNGKey(0), data)
        err = evaluate_gaze(m, vs, loader, image_size=32)
        assert np.isfinite(err) and 0 < err < 180

        cfg = SimpleNamespace(
            mode="test", exp_name="ev", output_dir=str(tmp_path / "logs"),
            ckpt_resume=None, print_freq=100, seed=0, batch_size=12,
            test_batch_size=12, epochs=1, save_epoch=10, image_size=32,
            scheduler_step="iteration",
        )
        trainer = Trainer(
            cfg, m, lambda out: jnp.zeros(()), None, loader,
            init_variables={k: jax.device_get(v) for k, v in vs.items()},
        )
        assert err == pytest.approx(trainer.test(-1), abs=1e-6)

    def test_ragged_final_batch_compiles_once(self, tmp_path):
        """evaluate_gaze must pad the ragged final batch to the full batch
        shape so the jitted step traces exactly once (a second trace is a
        second multi-minute compile on a tunneled TPU)."""
        write_synthetic_h5(str(tmp_path / "s.h5"), n_frames=2, image_size=32)
        ds = GazeDataset("xgaze", str(tmp_path), "bgr", ["s.h5"], stereo=False)
        assert len(ds) % 10 != 0  # guarantee a ragged final batch
        loader = BatchLoader(ds, batch_size=10)
        inner = SingleViewGazeNet(backbone_depth=18)
        vs = inner.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        traces = []

        class CountingModel:
            def apply(self, variables, data, train=False):
                traces.append(data["img_0"].shape)
                return inner.apply(variables, data, train=train)

        err = evaluate_gaze(
            CountingModel(), vs, loader, image_size=32, single_view=True
        )
        assert np.isfinite(err)
        assert len(traces) == 1, traces  # one trace == one compile
