"""Property-based tests (hypothesis) for the loss layer.

test_losses.py pins oracle parity against the reference loss modules
(/root/reference/losses/gaze_loss.py, stereo_loss.py) at fixed points;
these tests assert the ALGEBRAIC invariants over randomized inputs:

- the angular loss is the mean of the angular-error metric (so the loss
  inherits the metric axioms proven in test_property_geometry.py), is
  symmetric, and respects the documented clamp bias bound at zero error;
- l1/l2 losses satisfy the metric axioms and their closed forms;
- StereoL1Loss equals its closed form
  ``(L(g0,gt0) + decay*L(g1,gt1)) * rel_weight`` for every weighting;
- IterationLoss equals the geometric-decay closed form
  ``sum_i decay^(n-1-i) * L(iter_i)`` (reference recurrence
  /root/reference/losses/stereo_loss.py:74-77), including the
  additional_decay final-term variant and independence from dict
  insertion order / numeric (not lexicographic) iter-key ordering.

Vectorized over one hypothesis-generated batch per example to keep the
trace count at one per function; derandomized so failures reproduce
bit-identically on every machine.
"""

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402
from hypothesis.extra import numpy as hnp  # noqa: E402

from rot_mvgaze_tpu.geometry import angular_error_numpy  # noqa: E402
from rot_mvgaze_tpu.losses import (  # noqa: E402
    IterationLoss,
    StereoL1Loss,
    gaze_angular_loss,
    gaze_l1_loss,
    gaze_l2_loss,
)

_SETTINGS = dict(max_examples=50, deadline=None, derandomize=True)

# Same well-conditioned domain as test_property_geometry.py: pitch away
# from the +-pi/2 poles, yaw inside the open atan2 branch. The real
# gaze/head-pose data occupies a far narrower range.
_pitch = st.floats(-1.4, 1.4, allow_nan=False, allow_infinity=False)
_yaw = st.floats(-3.1, 3.1, allow_nan=False, allow_infinity=False)


def _pitchyaw_batch(draw, n):
    p = draw(hnp.arrays(np.float32, (n,), elements=_pitch))
    y = draw(hnp.arrays(np.float32, (n,), elements=_yaw))
    return np.stack([p, y], axis=-1)


@st.composite
def pitchyaw_pairs(draw, max_n=12):
    n = draw(st.integers(1, max_n))
    return _pitchyaw_batch(draw, n), _pitchyaw_batch(draw, n)


@st.composite
def stereo_data(draw, max_n=8):
    n = draw(st.integers(1, max_n))
    return {
        "pred_gaze_0": _pitchyaw_batch(draw, n),
        "pred_gaze_1": _pitchyaw_batch(draw, n),
        "gt_gaze": _pitchyaw_batch(draw, n),
        "gt_gaze_1": _pitchyaw_batch(draw, n),
    }


_weights = st.floats(0.0, 4.0, allow_nan=False, allow_infinity=False)


class TestGazeLossAxioms:
    @given(pitchyaw_pairs())
    @settings(**_SETTINGS)
    def test_angular_is_mean_of_metric(self, pys):
        a, b = pys
        loss = float(gaze_angular_loss(a, b))
        metric_mean = float(np.mean(angular_error_numpy(a, b)))
        # f32 arccos conditioning near 0/180 deg dominates (see the 0.25 deg
        # rationale in test_property_geometry.py); the similarity clamp adds
        # <=0.08 deg only at zero error.
        assert loss == pytest.approx(metric_mean, abs=0.25)
        assert 0.0 <= loss <= 180.0

    @given(pitchyaw_pairs())
    @settings(**_SETTINGS)
    def test_angular_symmetry_and_identity(self, pys):
        a, b = pys
        assert float(gaze_angular_loss(a, b)) == pytest.approx(
            float(gaze_angular_loss(b, a)), abs=1e-4
        )
        # identical prediction: bounded by the documented clamp bias
        # (arccos(1 - 1e-6) = 0.081 deg) plus f32 arccos conditioning
        # (a few ulps of cosine error near 1 cost ~0.05-0.1 deg)
        assert float(gaze_angular_loss(a, a)) <= 0.2

    @given(pitchyaw_pairs())
    @settings(**_SETTINGS)
    def test_l1_l2_closed_forms(self, pys):
        a, b = pys
        d = a.astype(np.float64) - b.astype(np.float64)
        assert float(gaze_l1_loss(a, b)) == pytest.approx(
            float(np.mean(np.abs(d))), rel=1e-5, abs=1e-6
        )
        assert float(gaze_l2_loss(a, b)) == pytest.approx(
            float(np.mean(d**2)), rel=1e-5, abs=1e-6
        )
        assert float(gaze_l1_loss(a, a)) == 0.0
        assert float(gaze_l2_loss(a, a)) == 0.0


class TestStereoL1LossClosedForm:
    @given(stereo_data(), _weights, _weights)
    @settings(**_SETTINGS)
    def test_matches_closed_form(self, data, rel_weight, decay):
        loss = StereoL1Loss(rel_weight=rel_weight, reference_decay=decay)
        got = float(loss(data))
        l0 = float(gaze_angular_loss(data["pred_gaze_0"], data["gt_gaze"]))
        l1 = float(gaze_angular_loss(data["pred_gaze_1"], data["gt_gaze_1"]))
        assert got == pytest.approx((l0 + decay * l1) * rel_weight, rel=1e-5, abs=1e-5)

    def test_rejects_other_metrics(self):
        with pytest.raises(ValueError, match="angular_error"):
            StereoL1Loss(distance_metric="l2")({})


def _iter_data(draw, n_iter, max_n=6):
    n = draw(st.integers(1, max_n))
    data = {
        "gt_gaze": _pitchyaw_batch(draw, n),
        "gt_gaze_1": _pitchyaw_batch(draw, n),
    }
    for i in range(n_iter):
        data[f"iter_{i}"] = {
            "pred_gaze_0": _pitchyaw_batch(draw, n),
            "pred_gaze_1": _pitchyaw_batch(draw, n),
        }
    return data


@st.composite
def iteration_data(draw, max_iter=11):
    # >= 10 iterations exercises numeric (iter_10 > iter_2) key ordering
    n_iter = draw(st.integers(1, max_iter))
    return n_iter, _iter_data(draw, n_iter)


class TestIterationLossClosedForm:
    @staticmethod
    def _per_iter_losses(data, n_iter, inner):
        common = {k: v for k, v in data.items() if not k.startswith("iter_")}
        return [
            float(inner({**common, **data[f"iter_{i}"]})) for i in range(n_iter)
        ]

    @given(iteration_data(), _weights)
    @settings(**_SETTINGS)
    def test_geometric_decay_closed_form(self, nd, decay):
        n_iter, data = nd
        inner = StereoL1Loss(rel_weight=0.01)
        per = self._per_iter_losses(data, n_iter, inner)
        expected = sum(decay ** (n_iter - 1 - i) * l for i, l in enumerate(per))
        got = float(IterationLoss(loss=inner, iter_decay=decay)(data))
        assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)

    @given(iteration_data(max_iter=6), _weights, _weights)
    @settings(**_SETTINGS)
    def test_additional_decay_final_term(self, nd, decay, add_decay):
        n_iter, data = nd
        inner = StereoL1Loss(rel_weight=0.01)
        per = self._per_iter_losses(data, n_iter, inner)
        body = sum(
            decay ** (n_iter - 2 - i) * l for i, l in enumerate(per[:-1])
        )
        expected = body + add_decay * per[-1]
        got = float(
            IterationLoss(
                loss=inner, iter_decay=decay, additional_decay=add_decay
            )(data)
        )
        assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)

    @given(iteration_data())
    @settings(**_SETTINGS)
    def test_dict_order_irrelevant(self, nd):
        n_iter, data = nd
        loss = IterationLoss(loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5)
        reversed_data = dict(reversed(list(data.items())))
        assert float(loss(data)) == float(loss(reversed_data))
