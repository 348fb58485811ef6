"""Shape/dtype/structure tests for the model layer (no reference needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.models import FeatRotationSymm, Mlp, resnet18, resnet50
from rot_mvgaze_tpu.models.rot_mv import IntensityBatchNorm


def _data(batch=2, size=32):
    k = jax.random.PRNGKey(0)
    eye = jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))
    return {
        "img_0": jax.random.normal(k, (batch, size, size, 3)),
        "img_1": jax.random.normal(k, (batch, size, size, 3)),
        "rot_0": eye,
        "rot_1": eye,
    }


class TestMlp:
    def test_shapes_and_params(self):
        m = Mlp(features=[8, 4])
        x = jnp.ones((3, 16))
        vs = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(vs, x)
        assert out.shape == (3, 4)
        assert set(vs["params"].keys()) == {"dense_0", "dense_1"}
        # last layer bare: output can be negative (no ReLU after last Dense)
        vs_neg = jax.tree.map(lambda p: -jnp.abs(p), vs)
        assert np.any(np.asarray(m.apply(vs_neg, x)) < 0)


class TestResNet:
    def test_resnet18_feature_dim(self):
        m = resnet18()
        x = jnp.zeros((2, 64, 64, 3))
        vs = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(vs, x, mutable=False)
        assert out.shape == (2, 512)
        assert m.feature_dim == 512

    def test_resnet50_feature_dim(self):
        assert resnet50().feature_dim == 2048

    def test_classification_head(self):
        m = resnet18(include_fc=True, num_classes=10)
        x = jnp.zeros((2, 64, 64, 3))
        vs = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(vs, x).shape == (2, 10)

    def test_train_updates_batch_stats(self):
        m = resnet18()
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
        vs = m.init(jax.random.PRNGKey(0), x)
        _, updates = m.apply(vs, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(vs["batch_stats"])
        after = jax.tree.leaves(updates["batch_stats"])
        assert any(
            not np.allclose(b, a) for b, a in zip(before, after)
        ), "train=True must update running statistics"


class TestIntensityBatchNorm:
    def test_eval_divides_by_running(self):
        m = IntensityBatchNorm(4)
        x = jnp.ones((2, 3, 4)) * 2.0
        vs = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(vs, x, train=False)
        np.testing.assert_allclose(out, x / (1.0 + 1e-4), atol=1e-6)

    def test_train_updates_running_std(self):
        m = IntensityBatchNorm(4)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 3, 4)) * 5.0
        vs = m.init(jax.random.PRNGKey(0), x)
        _, updates = m.apply(vs, x, train=True, mutable=["batch_stats"])
        new_running = updates["batch_stats"]["running_mean"]
        assert not np.allclose(new_running, 1.0)


class TestFeatRotationSymm:
    @pytest.mark.parametrize(
        "flags",
        [
            {},
            {"encode_rotmat": True},
            {"ignore_rotmat": True},
            {"share_feature": True},
            {"share_weights": True},
        ],
        ids=["default", "encode", "ignore", "sharefeat", "sharew"],
    )
    def test_output_contract(self, flags):
        m = FeatRotationSymm(backbone_depth=18, num_iter=2, **flags)
        data = _data()
        vs = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(vs, data)
        assert out["pred_gaze"].shape == (2, 2)
        for i in range(2):
            it = out[f"iter_{i}"]
            assert it["pred_gaze_0"].shape == (2, 2)
            assert it["pred_gaze_1"].shape == (2, 2)
            assert it["feat_0"].shape == (2, 3, 512)
        np.testing.assert_array_equal(
            out["pred_gaze"], out["iter_1"]["pred_gaze_0"]
        )
        # input keys preserved (dict-pipeline contract)
        for k in data:
            assert k in out

    def test_share_weights_single_param_set(self):
        m = FeatRotationSymm(backbone_depth=18, num_iter=3, share_weights=True)
        vs = m.init(jax.random.PRNGKey(0), _data())
        fusers = [k for k in vs["params"] if k.startswith("img_fuser")]
        assert fusers == ["img_fuser_0"]

    def test_jit_forward(self):
        m = FeatRotationSymm(backbone_depth=18, num_iter=2)
        data = _data()
        vs = m.init(jax.random.PRNGKey(0), data)
        f = jax.jit(lambda v, d: m.apply(v, d)["pred_gaze"])
        out = f(vs, data)
        assert out.shape == (2, 2)

    def test_grad_flows(self):
        m = FeatRotationSymm(backbone_depth=18, num_iter=2)
        data = _data()
        vs = m.init(jax.random.PRNGKey(0), data)

        def loss_fn(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                data,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out["pred_gaze"] ** 2)

        grads = jax.grad(loss_fn)(vs["params"])
        gnorms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
        assert max(gnorms) > 0.0
        assert all(np.isfinite(g) for g in gnorms)

    def test_bf16_compute(self):
        m = FeatRotationSymm(backbone_depth=18, num_iter=2, dtype=jnp.bfloat16)
        data = _data()
        vs = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(vs, data)
        assert out["pred_gaze"].shape == (2, 2)
        # params stay f32
        assert all(
            p.dtype == jnp.float32 for p in jax.tree.leaves(vs["params"])
        )


class TestPallasFusionPath:
    def test_matches_xla_path(self):
        """use_pallas_fusion=True shares params and matches the XLA path."""
        data = _data(batch=2, size=32)
        m_ref = FeatRotationSymm(backbone_depth=18, num_iter=2)
        m_pal = FeatRotationSymm(
            backbone_depth=18, num_iter=2, use_pallas_fusion=True
        )
        vs = m_ref.init(jax.random.PRNGKey(0), data)
        vs2 = m_pal.init(jax.random.PRNGKey(0), data)
        assert jax.tree.structure(vs) == jax.tree.structure(vs2)
        out_ref = m_ref.apply(vs, data)
        out_pal = m_pal.apply(vs, data)
        np.testing.assert_allclose(
            out_pal["pred_gaze"], out_ref["pred_gaze"], atol=2e-4, rtol=1e-4
        )


class TestRemat:
    def test_remat_grads_match_plain(self):
        data = _data(batch=2, size=32)
        m_plain = FeatRotationSymm(backbone_depth=18, num_iter=1)
        m_remat = FeatRotationSymm(backbone_depth=18, num_iter=1, remat=True)
        vs = m_plain.init(jax.random.PRNGKey(0), data)
        assert jax.tree.structure(vs) == jax.tree.structure(
            m_remat.init(jax.random.PRNGKey(0), data)
        )

        def loss(m, p):
            out, _ = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]},
                data, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out["pred_gaze"] ** 2)

        g1 = jax.grad(lambda p: loss(m_plain, p))(vs["params"])
        g2 = jax.grad(lambda p: loss(m_remat, p))(vs["params"])
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(a, b, atol=1e-6)


class TestExtendedBackboneFamily:
    """Depths beyond the reference's 18/50 (its constructor raises for any
    other, /root/reference/models/rot_mv.py:119-123) — usable here because
    the backbone table, converter entries, and feature dims are
    depth-general."""

    @pytest.mark.parametrize("depth,feat", [(34, 512), (101, 2048)])
    def test_forward_and_roundtrip(self, depth, feat):
        from rot_mvgaze_tpu.compat import flax_to_torch_state_dict

        m = FeatRotationSymm(backbone_depth=depth, num_iter=1)
        data = _data()
        vs = m.init(jax.random.PRNGKey(0), data)
        out = m.apply(vs, data)
        assert out["pred_gaze"].shape == (2, 2)
        assert out["img_feat_0"].shape == (2, feat)
        # converter coverage: every flax param/stat maps to a torch key
        sd = flax_to_torch_state_dict(
            {k: jax.device_get(v) for k, v in vs.items()},
            backbone_depth=depth, num_iter=1,
        )
        assert any(k.startswith("_feat_extractor.0.layer4") for k in sd)


class TestConvTransposeTorchParity:
    def test_transpose_conv_matches_torch(self):
        """Conv2dTransposeNet must reproduce torch ConvTranspose2d(k,s,p)
        exactly (shape AND values): torch p maps to flax pad k-1-p with
        transpose_kernel=True."""
        import torch

        from rot_mvgaze_tpu.models.blocks import Conv2dTransposeNet

        rng = np.random.default_rng(0)
        IN, OUT, K, S, P = 2, 3, 4, 2, 1
        x = rng.standard_normal((1, 5, 5, IN)).astype(np.float32)
        tw = rng.standard_normal((IN, OUT, K, K)).astype(np.float32)
        tb = rng.standard_normal((OUT,)).astype(np.float32)

        tm = torch.nn.ConvTranspose2d(IN, OUT, K, stride=S, padding=P)
        with torch.no_grad():
            tm.weight.copy_(torch.from_numpy(tw))
            tm.bias.copy_(torch.from_numpy(tb))
        ref = (
            tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .detach().numpy().transpose(0, 2, 3, 1)
        )

        net = Conv2dTransposeNet(
            features=[OUT], kernels=[K], strides=[S], paddings=[P]
        )
        params = {
            "convt_0": {
                # flax transpose_kernel layout (k,k,out,in)
                "kernel": jnp.asarray(tw.transpose(2, 3, 1, 0).copy()),
                "bias": jnp.asarray(tb),
            }
        }
        out = net.apply({"params": params}, jnp.asarray(x))
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestWeightCopyShapes:
    def test_shape_mismatch_raises(self):
        from rot_mvgaze_tpu.models.blocks import weight_copy

        dst = {"a": jnp.zeros((2, 3))}
        src_ok = {"a": jnp.ones((2, 3))}
        src_bad = {"a": jnp.ones((2, 4))}  # same structure, different shape
        out = weight_copy(dst, src_ok)
        np.testing.assert_array_equal(np.asarray(out["a"]), 1.0)
        with pytest.raises(ValueError, match="shape mismatch"):
            weight_copy(dst, src_bad)
        with pytest.raises(ValueError, match="structures differ"):
            weight_copy(dst, {"b": jnp.ones((2, 3))})


class TestPallasBnDpGuard:
    def test_pallas_bn_with_axis_name_rejected(self):
        from rot_mvgaze_tpu.models.resnet import resnet18

        model = resnet18(use_pallas_bn=True, bn_axis_name="data")
        with pytest.raises(ValueError, match="cross-replica"):
            model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, 32, 32, 3)),
                train=True,
            )

    @pytest.mark.parametrize(
        "combo",
        [dict(encode_rotmat=True), dict(share_weights=True)],
        ids=["encode_rotmat", "share_weights"],
    )
    def test_share_feature_invalid_combos_rejected(self, combo):
        # Both combos are unconstructible in the reference (its forward
        # crashes on fuser arity/shape, /root/reference/models/rot_mv.py:
        # 151-158,219-225) — no trained checkpoint can exist, so refuse
        # instead of inventing semantics.
        from rot_mvgaze_tpu.models import FeatRotationSymm

        model = FeatRotationSymm(
            backbone_depth=18, num_iter=2, share_feature=True, **combo
        )
        data = {
            "img_0": jnp.zeros((1, 32, 32, 3)),
            "img_1": jnp.zeros((1, 32, 32, 3)),
            "rot_0": jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
            "rot_1": jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
        }
        with pytest.raises(ValueError, match="share_feature"):
            model.init({"params": jax.random.PRNGKey(0)}, data)


class TestBnStatSubsample:
    """Ghost-stat BN (r3 perf experiment): train-mode batch statistics from
    every k-th batch row (models/norm.py TorchBatchNorm.stat_subsample).
    Opt-in training-dynamics deviation; default k=1 stays reference-exact."""

    def test_subsample_stats_come_from_selected_rows(self):
        from rot_mvgaze_tpu.models.norm import TorchBatchNorm

        rng = np.random.default_rng(0)
        # first half ~N(0,1), second half shifted to N(5,1): k=2 must see
        # only the prefix rows' statistics (contiguous prefix slice — the
        # strided variant measured 37% slower end-to-end, docs/PERF.md)
        x = rng.normal(size=(8, 4, 4, 3)).astype(np.float32)
        x[4:] += 5.0
        bn = TorchBatchNorm(use_running_average=False, stat_subsample=2)
        vars0 = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y, mut = bn.apply(
            vars0, jnp.asarray(x), mutable=["batch_stats"]
        )
        xs = x[:4].astype(np.float64)
        mean = xs.mean(axis=(0, 1, 2))
        var = xs.var(axis=(0, 1, 2))  # biased, as torch normalizes
        expect = (x - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(np.asarray(y), expect, atol=1e-4)
        # running stats: torch semantics, Bessel n = SUBSAMPLED count
        n = xs.size // 3
        unbiased = var * n / (n - 1)
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]), 0.1 * mean, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]),
            0.9 + 0.1 * unbiased,
            atol=1e-5,
        )

    def test_k1_matches_default_module(self):
        from rot_mvgaze_tpu.models.norm import TorchBatchNorm

        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(4, 2, 2, 5)).astype(np.float32)
        )
        a = TorchBatchNorm(use_running_average=False)
        b = TorchBatchNorm(use_running_average=False, stat_subsample=1)
        v = a.init(jax.random.PRNGKey(0), x)
        ya, _ = a.apply(v, x, mutable=["batch_stats"])
        yb, _ = b.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))

    def test_model_trains_with_subsample(self):
        model = FeatRotationSymm(
            backbone_depth=18, num_iter=1, bn_stat_subsample=2
        )
        data = _data(batch=4)
        variables = model.init({"params": jax.random.PRNGKey(0)}, data)
        out, _ = model.apply(
            variables, data, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert np.isfinite(np.asarray(out["pred_gaze"])).all()

    def test_too_few_rows_rejected(self):
        from rot_mvgaze_tpu.models.norm import TorchBatchNorm

        x = jnp.zeros((3, 2, 2, 4))
        bn = TorchBatchNorm(use_running_average=False, stat_subsample=2)
        with pytest.raises(ValueError, match="batch rows"):
            bn.init(jax.random.PRNGKey(0), x)

    def test_pallas_bn_combination_rejected(self):
        model = resnet18(use_pallas_bn=True, bn_stat_subsample=2)
        with pytest.raises(ValueError, match="TorchBatchNorm path"):
            model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((4, 32, 32, 3)),
                train=True,
            )

    def test_cli_flag_threads_to_model(self):
        from rot_mvgaze_tpu.cli.main import get_parser

        args, _ = get_parser().parse_known_args(
            ["--exp_name", "xgaze", "--bn_stat_subsample", "4"]
        )
        assert args.bn_stat_subsample == 4


class TestPallasBnFlagValidation:
    def test_unknown_mode_rejected(self):
        from rot_mvgaze_tpu.models.resnet import _pallas_bn_flags

        with pytest.raises(ValueError, match="use_pallas_bn must be"):
            _pallas_bn_flags("Residual")  # wrong case — not silently off

    def test_known_modes(self):
        from rot_mvgaze_tpu.models.resnet import _pallas_bn_flags

        assert _pallas_bn_flags(False) == (False, False)
        assert _pallas_bn_flags(True) == (True, True)
        assert _pallas_bn_flags("residual") == (False, True)


def test_fuse_views_with_stat_subsample_rejected():
    """fuse_views stacks [view0; view1]; a prefix stat subsample would see
    view-0 rows only — the combination must refuse, not silently bias BN."""
    m = FeatRotationSymm(
        backbone_depth=18, num_iter=1, fuse_views=True, bn_stat_subsample=2
    )
    with pytest.raises(ValueError, match="view-0"):
        m.init({"params": jax.random.PRNGKey(0)}, _data(batch=4))


def test_basic_block_rejects_grouped_config():
    """torchvision raises for grouped/wide BasicBlock nets; silently
    training a plain net under that config would be worse."""
    from rot_mvgaze_tpu.models.resnet import resnet18

    m = resnet18(groups=32, width_per_group=4)
    with pytest.raises(ValueError, match="groups=1"):
        m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)))


def test_resnet_enforces_in_channels():
    from rot_mvgaze_tpu.models.resnet import resnet18

    m = resnet18()
    with pytest.raises(ValueError, match="in_channels=3"):
        m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 1)))


def test_pallas_fusion_inert_ablations_rejected():
    m = FeatRotationSymm(
        backbone_depth=18, num_iter=1, ignore_rotmat=True,
        use_pallas_fusion=True,
    )
    with pytest.raises(ValueError, match="silently inert"):
        m.init({"params": jax.random.PRNGKey(0)}, _data())
