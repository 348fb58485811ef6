"""FeatRotationMultiView: N-view generalization of the stereo fusion model.

Pins the two properties that make it safe: (a) at V=2 it reduces
BIT-EXACTLY to FeatRotationSymm (eval mode: identical math, identical
row-wise modules), and (b) its parameter tree is checkpoint-compatible
with the stereo model (same submodule names/shapes), so stereo
checkpoints — including converted reference ones — load unchanged at any V.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.geometry import rotation_matrix_2d
from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
from rot_mvgaze_tpu.losses.multiview import MultiViewL1Loss
from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.models.multiview import FeatRotationMultiView

B, S = 4, 32


def _inputs(V, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((B, V, S, S, 3)).astype(np.float32)
    hps = rng.uniform(-0.8, 0.8, (B * V, 2)).astype(np.float32)
    rots = np.asarray(rotation_matrix_2d(jnp.asarray(hps))).reshape(
        B, V, 3, 3
    )
    gts = rng.uniform(-1, 1, (B, V, 2)).astype(np.float32)
    return jnp.asarray(imgs), jnp.asarray(rots), jnp.asarray(gts)


def _stereo_vars(**kwargs):
    model = FeatRotationSymm(backbone_depth=18, num_iter=2, **kwargs)
    init = {
        "img_0": jnp.zeros((2, S, S, 3)),
        "img_1": jnp.zeros((2, S, S, 3)),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    return model, model.init({"params": jax.random.PRNGKey(0)}, init)


class TestReduction:
    @pytest.mark.parametrize(
        "flags",
        [{}, {"share_weights": True}, {"ignore_rotmat": True}],
        ids=["default", "share_weights", "ignore_rotmat"],
    )
    def test_v2_reduces_bit_exactly_to_stereo(self, flags):
        stereo, variables = _stereo_vars(**flags)
        mv = FeatRotationMultiView(backbone_depth=18, num_iter=2, **flags)
        imgs, rots, _ = _inputs(2)
        out_mv = mv.apply(variables, {"imgs": imgs, "rots": rots}, train=False)
        out_st = stereo.apply(
            variables,
            {
                "img_0": imgs[:, 0],
                "img_1": imgs[:, 1],
                "rot_0": rots[:, 0],
                "rot_1": rots[:, 1],
            },
            train=False,
        )
        np.testing.assert_array_equal(
            np.asarray(out_mv["pred_gaze"]), np.asarray(out_st["pred_gaze"])
        )
        for i in range(2):
            for v, key in ((0, "pred_gaze_0"), (1, "pred_gaze_1")):
                np.testing.assert_array_equal(
                    np.asarray(out_mv[f"iter_{i}"]["pred_gazes"][:, v]),
                    np.asarray(out_st[f"iter_{i}"][key]),
                )
                np.testing.assert_array_equal(
                    np.asarray(out_mv[f"iter_{i}"]["feats"][:, v]),
                    np.asarray(out_st[f"iter_{i}"][f"feat_{v}"]),
                )

    def test_stereo_checkpoint_runs_at_v3(self):
        _, variables = _stereo_vars()
        mv = FeatRotationMultiView(backbone_depth=18, num_iter=2)
        imgs, rots, _ = _inputs(3)
        out = mv.apply(variables, {"imgs": imgs, "rots": rots}, train=False)
        assert out["pred_gaze"].shape == (B, 2)
        assert out["num_views"] == 3
        assert bool(jnp.isfinite(out["pred_gaze"]).all())
        for i in range(2):
            assert out[f"iter_{i}"]["pred_gazes"].shape == (B, 3, 2)
            assert out[f"iter_{i}"]["feats"].shape == (B, 3, 3, 512)

    def test_param_tree_matches_stereo(self):
        stereo, stereo_vars = _stereo_vars()
        mv = FeatRotationMultiView(backbone_depth=18, num_iter=2)
        imgs, rots, _ = _inputs(3)
        mv_vars = mv.init(
            {"params": jax.random.PRNGKey(0)}, {"imgs": imgs, "rots": rots}
        )
        paths_st = {
            jax.tree_util.keystr(p): l.shape
            for p, l in jax.tree_util.tree_leaves_with_path(stereo_vars)
        }
        paths_mv = {
            jax.tree_util.keystr(p): l.shape
            for p, l in jax.tree_util.tree_leaves_with_path(mv_vars)
        }
        assert paths_st == paths_mv

    def test_train_mode_updates_stats_and_grads_flow(self):
        mv = FeatRotationMultiView(backbone_depth=18, num_iter=2)
        imgs, rots, gts = _inputs(3)
        variables = mv.init(
            {"params": jax.random.PRNGKey(0)}, {"imgs": imgs, "rots": rots}
        )
        metrics = IterationLoss(
            loss=MultiViewL1Loss(rel_weight=0.01), iter_decay=0.5
        )

        def loss_fn(params):
            out, updates = mv.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                {"imgs": imgs, "rots": rots, "gt_gazes": gts},
                train=True,
                mutable=["batch_stats"],
            )
            return metrics(out), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(loss))
        gnorms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(gnorms)) and max(gnorms) > 0
        # BN stats moved
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(new_stats)
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(after, before)
        )

    def test_rejects_single_view(self):
        _, variables = _stereo_vars()
        mv = FeatRotationMultiView(backbone_depth=18, num_iter=2)
        imgs, rots, _ = _inputs(2)
        with pytest.raises(ValueError, match="at least 2 views"):
            mv.apply(
                variables,
                {"imgs": imgs[:, :1], "rots": rots[:, :1]},
                train=False,
            )


class TestMultiViewLoss:
    def test_v2_equals_stereo_loss(self):
        rng = np.random.default_rng(1)
        preds = rng.uniform(-1, 1, (B, 2, 2)).astype(np.float32)
        gts = rng.uniform(-1, 1, (B, 2, 2)).astype(np.float32)
        mv_loss = MultiViewL1Loss(rel_weight=0.01, reference_decay=1.0)
        st_loss = StereoL1Loss(rel_weight=0.01, reference_decay=1.0)
        got = float(
            mv_loss({"pred_gazes": jnp.asarray(preds), "gt_gazes": jnp.asarray(gts)})
        )
        want = float(
            st_loss(
                {
                    "pred_gaze_0": jnp.asarray(preds[:, 0]),
                    "pred_gaze_1": jnp.asarray(preds[:, 1]),
                    "gt_gaze": jnp.asarray(gts[:, 0]),
                    "gt_gaze_1": jnp.asarray(gts[:, 1]),
                }
            )
        )
        assert got == pytest.approx(want, rel=1e-6)

    def test_iteration_loss_composes(self):
        rng = np.random.default_rng(2)
        gts = jnp.asarray(rng.uniform(-1, 1, (B, 3, 2)).astype(np.float32))
        data = {"gt_gazes": gts}
        for i in range(3):
            data[f"iter_{i}"] = {
                "pred_gazes": jnp.asarray(
                    rng.uniform(-1, 1, (B, 3, 2)).astype(np.float32)
                )
            }
        metrics = IterationLoss(
            loss=MultiViewL1Loss(rel_weight=0.01), iter_decay=0.5
        )
        total = float(metrics(data))
        assert np.isfinite(total) and total > 0
        # manual recomputation
        lf = MultiViewL1Loss(rel_weight=0.01)
        want = 0.0
        for i in range(3):
            want = want * 0.5 + float(
                lf({"pred_gazes": data[f"iter_{i}"]["pred_gazes"],
                    "gt_gazes": gts})
            )
        assert total == pytest.approx(want, rel=1e-6)

    def test_shape_mismatch_rejected(self):
        lf = MultiViewL1Loss()
        with pytest.raises(ValueError, match=r"\(B, V, 2\)"):
            lf({"pred_gazes": jnp.zeros((4, 3, 2)),
                "gt_gazes": jnp.zeros((4, 2, 2))})
