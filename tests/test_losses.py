"""Loss-layer tests: numerical parity vs the reference loss stack plus
standalone behavior checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.losses import (
    IterationLoss,
    StereoL1Loss,
    gaze_angular_loss,
    gaze_l1_loss,
    gaze_l2_loss,
)

from reference_harness import reference_available


def _fake_output(num_iter=3, batch=5, seed=0):
    rng = np.random.RandomState(seed)
    data = {
        "gt_gaze": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "gt_gaze_1": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "num_iter": num_iter,
    }
    for i in range(num_iter):
        data[f"iter_{i}"] = {
            "pred_gaze_0": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
            "pred_gaze_1": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        }
    return data


class TestGazeLosses:
    def test_l1_l2(self):
        y = jnp.array([[0.1, 0.2]])
        y_hat = jnp.array([[0.3, -0.2]])
        np.testing.assert_allclose(gaze_l1_loss(y, y_hat), 0.3, atol=1e-7)
        np.testing.assert_allclose(gaze_l2_loss(y, y_hat), (0.04 + 0.16) / 2, atol=1e-7)

    def test_angular_zero_for_identical(self):
        # < 0.1 deg: the stability clamp floors the loss at acos(1-1e-6)
        y = jnp.array([[0.1, 0.2], [0.4, -0.3]])
        assert float(gaze_angular_loss(y, y)) < 0.1

    def test_angular_grad_finite(self):
        y = jnp.array([[0.1, 0.2]])
        y_hat = jnp.array([[0.3, -0.2]])
        g = jax.grad(lambda p: gaze_angular_loss(p, y))(y_hat)
        assert np.all(np.isfinite(g))


class TestIterationLoss:
    def test_decay_weighting(self):
        """total = 0.25*L0 + 0.5*L1 + 1.0*L2 for iter_decay=0.5, 3 iters."""
        metrics = IterationLoss(loss=StereoL1Loss(rel_weight=1.0), iter_decay=0.5)
        data = _fake_output(num_iter=3)
        total = float(metrics(data))
        single = StereoL1Loss(rel_weight=1.0)
        parts = [
            float(single({**{k: v for k, v in data.items() if not k.startswith("iter_")},
                          **data[f"iter_{i}"]}))
            for i in range(3)
        ]
        expected = 0.25 * parts[0] + 0.5 * parts[1] + 1.0 * parts[2]
        np.testing.assert_allclose(total, expected, rtol=1e-6)

    def test_additional_decay(self):
        metrics = IterationLoss(
            loss=StereoL1Loss(rel_weight=1.0), iter_decay=0.5, additional_decay=2.0
        )
        data = _fake_output(num_iter=3)
        single = StereoL1Loss(rel_weight=1.0)
        common = {k: v for k, v in data.items() if not k.startswith("iter_")}
        parts = [float(single({**common, **data[f"iter_{i}"]})) for i in range(3)]
        expected = 0.5 * parts[0] + parts[1] + 2.0 * parts[2]
        np.testing.assert_allclose(float(metrics(data)), expected, rtol=1e-6)

    def test_jit(self):
        metrics = IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5)
        data = _fake_output()
        out = jax.jit(metrics)(data)
        np.testing.assert_allclose(out, metrics(data), rtol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
class TestReferenceParity:
    def test_shipped_loss_stack(self):
        """Exact config of /root/reference/main.py:239-240."""
        import torch

        from reference_harness import import_reference_models

        import_reference_models()  # ensures stubs + sys.path
        from losses.stereo_loss import IterationLoss as RefIterationLoss
        from losses.stereo_loss import StereoL1Loss as RefStereoL1Loss

        data = _fake_output(num_iter=3)
        ref_metrics = RefIterationLoss(
            loss=RefStereoL1Loss(
                rel_weight=0.01,
                reference_decay=1.0,
                distance_metric="angular_error",
                pred_gaze_key="pred_gaze",
            ),
            iter_decay=0.5,
        )
        torch_data = {
            k: (
                {kk: torch.from_numpy(vv) for kk, vv in v.items()}
                if isinstance(v, dict)
                else (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
            )
            for k, v in data.items()
        }
        ref_total = float(ref_metrics(torch_data))

        ours = IterationLoss(
            loss=StereoL1Loss(rel_weight=0.01, reference_decay=1.0), iter_decay=0.5
        )
        np.testing.assert_allclose(float(ours(data)), ref_total, rtol=1e-5)


class TestConverterMisconfig:
    def test_wrong_config_reports_leftovers(self):
        """check_conversion_coverage flags config/checkpoint mismatches."""
        pytest.importorskip("torch")
        from reference_harness import reference_available

        if not reference_available():
            pytest.skip("reference unavailable")
        import torch

        from reference_harness import import_reference_models
        from rot_mvgaze_tpu.compat.torch_convert import (
            check_conversion_coverage,
        )

        ref_rot_mv, _ = import_reference_models()
        torch.manual_seed(0)
        model = ref_rot_mv.FeatRotationSymm(
            backbone_depth=18, num_iter=3,
            share_weights=False, encode_rotmat=False,
            share_feature=False, ignore_rotmat=False,
        )
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        # claim num_iter=2: iteration-2 fuser/head keys must be left over
        leftovers = check_conversion_coverage(sd, backbone_depth=18, num_iter=2)
        assert any("_img_fusers.2" in k for k in leftovers)
        # correct config: nothing left over
        assert check_conversion_coverage(sd, backbone_depth=18, num_iter=3) == []


class TestAngularGradStability:
    def test_grad_finite_at_identical_predictions(self):
        """Latent reference bug: d/dx arccos at cos_sim==1 is infinite.
        Our epsilon clamp must keep gradients finite even when a prediction
        exactly matches its label (likely under bfloat16)."""
        y = jnp.array([[0.3, -0.2], [0.0, 0.0]])
        for delta in (0.0, 1e-7, 1e-3):
            g = jax.grad(lambda p: gaze_angular_loss(p, y))(y + delta)
            assert np.all(np.isfinite(np.asarray(g))), f"delta={delta}"

    def test_loss_bias_negligible(self):
        """The clamp changes the loss by < 0.1 deg and only near zero error."""
        y = jnp.array([[0.3, -0.2]])
        assert float(gaze_angular_loss(y, y)) < 0.1  # floor ~0.08 deg
        far = float(gaze_angular_loss(y + 0.5, y))
        assert far > 10


def test_stereo_loss_rejects_unimplemented_metric():
    """The reference silently ignores distance_metric (stereo_loss.py:37-39
    hardcodes angular); we refuse loudly instead of training identical runs
    in a metric sweep."""
    loss = StereoL1Loss(distance_metric="l2")
    data = {
        "pred_gaze_0": jnp.zeros((2, 2)), "pred_gaze_1": jnp.zeros((2, 2)),
        "gt_gaze": jnp.zeros((2, 2)), "gt_gaze_1": jnp.zeros((2, 2)),
    }
    with pytest.raises(ValueError, match="angular_error"):
        loss(data)
