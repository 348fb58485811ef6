"""Fused Pallas BatchNorm tests (interpreter mode on CPU): forward and
backward numerics vs a pure-XLA reference, all act/residual variants, and
the flax wrapper's torch-style running-stat semantics."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rot_mvgaze_tpu.models import FeatRotationSymm, resnet18
from rot_mvgaze_tpu.models.norm import PallasBatchNormAct
from rot_mvgaze_tpu.ops.batchnorm import fused_batchnorm_act


def _xla_bn(x, scale, bias, residual, eps, relu):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
    var = jnp.mean(jnp.square(xf), axis=tuple(range(x.ndim - 1))) - mean**2
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype), mean, var


def _inputs(shape=(16, 8, 8, 128), seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape), dtype)
    c = shape[-1]
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    res = jnp.asarray(rng.randn(*shape) * 0.5, dtype)
    return x, scale, bias, res


class TestFusedBatchNormAct:
    @pytest.mark.parametrize("relu", [False, True], ids=["linear", "relu"])
    @pytest.mark.parametrize("with_res", [False, True], ids=["nores", "res"])
    def test_forward_matches_xla(self, relu, with_res):
        x, scale, bias, res = _inputs()
        res_in = res if with_res else None
        y, mean, var = fused_batchnorm_act(x, scale, bias, res_in, 1e-5, relu)
        y_ref, mean_ref, var_ref = _xla_bn(x, scale, bias, res_in, 1e-5, relu)
        np.testing.assert_allclose(y, y_ref, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(mean, mean_ref, atol=1e-5)
        np.testing.assert_allclose(var, var_ref, atol=1e-5)

    @pytest.mark.parametrize("relu", [False, True], ids=["linear", "relu"])
    @pytest.mark.parametrize("with_res", [False, True], ids=["nores", "res"])
    def test_gradients_match_xla(self, relu, with_res):
        x, scale, bias, res = _inputs(shape=(8, 4, 4, 128))
        res_in = res if with_res else None

        def loss_fused(args):
            x_, s_, b_, r_ = args
            y, _, _ = fused_batchnorm_act(x_, s_, b_, r_, 1e-5, relu)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def loss_xla(args):
            x_, s_, b_, r_ = args
            y, _, _ = _xla_bn(x_, s_, b_, r_, 1e-5, relu)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        args = (x, scale, bias, res_in)
        g_f = jax.grad(loss_fused)(args)
        g_x = jax.grad(loss_xla)(args)
        names = ["x", "scale", "bias", "res"]
        for a, b, name in zip(g_f, g_x, names):
            if a is None and b is None:
                continue
            np.testing.assert_allclose(
                a, b, atol=5e-4, rtol=1e-3, err_msg=f"grad {name}"
            )

    def test_stat_grads_do_not_crash(self):
        """Cotangents on mean/var outputs (running-update path) are dropped."""
        x, scale, bias, _ = _inputs(shape=(8, 4, 4, 128))

        def loss(x_):
            y, mean, var = fused_batchnorm_act(x_, scale, bias, None, 1e-5, True)
            return jnp.sum(y) + 0.0 * jnp.sum(jax.lax.stop_gradient(mean + var))

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(g))


class TestPallasBatchNormActModule:
    def test_matches_flax_bn_eval(self):
        """Eval path: identical to nn.BatchNorm given the same stats."""
        x, scale, bias, _ = _inputs()
        mod = PallasBatchNormAct(relu=False)
        vs = {
            "params": {"scale": scale, "bias": bias},
            "batch_stats": {
                "mean": jnp.full((128,), 0.3, jnp.float32),
                "var": jnp.full((128,), 2.0, jnp.float32),
            },
        }
        got = mod.apply(vs, x, train=False)
        ref_mod = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
        want = ref_mod.apply(vs, x)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_train_updates_running_stats_torch_style(self):
        x, scale, bias, _ = _inputs(shape=(4, 2, 2, 128))
        mod = PallasBatchNormAct(relu=True, momentum=0.9)
        vs = mod.init(jax.random.PRNGKey(0), x, train=False)
        _, updates = mod.apply(vs, x, train=True, mutable=["batch_stats"])
        n = x.size // 128
        xf = np.asarray(x, np.float64).reshape(-1, 128)
        bmean = xf.mean(0)
        bvar_unbiased = xf.var(0, ddof=1)
        np.testing.assert_allclose(
            updates["batch_stats"]["mean"], 0.9 * 0 + 0.1 * bmean, atol=1e-4
        )
        np.testing.assert_allclose(
            updates["batch_stats"]["var"],
            0.9 * 1 + 0.1 * bvar_unbiased,
            atol=1e-4,
        )


class TestResNetPallasBN:
    def test_pallas_bn_resnet_matches_default_eval(self):
        """Same params; eval outputs identical between BN implementations."""
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        m_ref = resnet18()
        m_pal = resnet18(use_pallas_bn=True)
        vs = m_ref.init(jax.random.PRNGKey(1), x)
        vs2 = m_pal.init(jax.random.PRNGKey(1), x)
        assert jax.tree.structure(vs) == jax.tree.structure(vs2)
        out_ref = m_ref.apply(vs, x, mutable=False)
        out_pal = m_pal.apply(vs, x, mutable=False)
        np.testing.assert_allclose(out_pal, out_ref, atol=1e-5, rtol=1e-4)

    def test_pallas_bn_resnet_train_step(self):
        """Train mode: grads finite, loss close to the flax-BN model's."""
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
        m_ref = resnet18()
        m_pal = resnet18(use_pallas_bn=True)
        vs = m_ref.init(jax.random.PRNGKey(1), x)

        def loss(m, params):
            out, _ = m.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l_ref, g_ref = jax.value_and_grad(lambda p: loss(m_ref, p))(vs["params"])
        l_pal, g_pal = jax.value_and_grad(lambda p: loss(m_pal, p))(vs["params"])
        np.testing.assert_allclose(l_pal, l_ref, rtol=1e-4)
        # var is computed as E[x^2]-E[x]^2 in the fused kernel vs flax's
        # E[(x-mean)^2]; through 18 BN layers the grads accumulate small fp
        # differences — allow a loose elementwise tolerance.
        for a, b in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(a, b, atol=5e-3, rtol=5e-2)

    def test_residual_only_mode_matches_default(self):
        """use_pallas_bn="residual" (r3: Pallas only at block-tail
        BN+residual+ReLU positions, body BNs stay in XLA) — same param tree,
        train-mode outputs within the fused-variance formulation tolerance,
        eval outputs near-exact."""
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        m_ref = resnet18()
        m_res = resnet18(use_pallas_bn="residual")
        vs = m_ref.init(jax.random.PRNGKey(1), x)
        assert jax.tree.structure(vs) == jax.tree.structure(
            m_res.init(jax.random.PRNGKey(1), x)
        )
        out_ref = m_ref.apply(vs, x, mutable=False)
        out_res = m_res.apply(vs, x, mutable=False)
        np.testing.assert_allclose(out_res, out_ref, atol=1e-5, rtol=1e-4)
        t_ref, _ = m_ref.apply(vs, x, train=True, mutable=["batch_stats"])
        t_res, _ = m_res.apply(vs, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(t_res, t_ref, atol=5e-3, rtol=5e-2)

    def test_full_model_pallas_bn_eval_parity(self):
        data_key = jax.random.PRNGKey(0)
        eye = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        data = {
            "img_0": jax.random.normal(data_key, (2, 32, 32, 3)),
            "img_1": jax.random.normal(data_key, (2, 32, 32, 3)),
            "rot_0": eye,
            "rot_1": eye,
        }
        m_ref = FeatRotationSymm(backbone_depth=18, num_iter=1)
        m_pal = FeatRotationSymm(backbone_depth=18, num_iter=1, use_pallas_bn=True)
        vs = m_ref.init(jax.random.PRNGKey(1), data)
        out_ref = m_ref.apply(vs, data)
        out_pal = m_pal.apply(vs, data)
        np.testing.assert_allclose(
            out_pal["pred_gaze"], out_ref["pred_gaze"], atol=1e-4, rtol=1e-4
        )


def test_stat_cotangents_not_discarded():
    """Differentiating through the RETURNED batch mean/var must give the
    true gradient (review r2b: the bwd used to silently drop them)."""
    from rot_mvgaze_tpu.ops.batchnorm import fused_batchnorm_act

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    scale = jnp.ones((3,), jnp.float32)
    bias = jnp.zeros((3,), jnp.float32)

    def loss_via_stats(x):
        _, mean, var = fused_batchnorm_act(x, scale, bias, None, 1e-5, False)
        return jnp.sum(mean * 3.0) + jnp.sum(var * 0.5)

    def loss_ref(x):
        c = x.shape[-1]
        x2 = x.reshape(-1, c)
        mean = jnp.mean(x2, axis=0)
        var = jnp.mean(jnp.square(x2), axis=0) - mean * mean
        return jnp.sum(mean * 3.0) + jnp.sum(var * 0.5)

    g = jax.grad(loss_via_stats)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
