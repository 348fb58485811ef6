"""Utility-layer tests: meters, reflective config builder, conv block
library, distributed host-shard math."""

import jax
import jax.numpy as jnp
import numpy as np

from rot_mvgaze_tpu.models.blocks import Conv2dNet, Conv2dTransposeNet
from rot_mvgaze_tpu.parallel.distributed import host_shard
from rot_mvgaze_tpu.utils import AverageMeter, build_model_from_cfg, set_seed


class TestAverageMeter:
    def test_running_average(self):
        m = AverageMeter()
        m.update(2.0)
        m.update(4.0, n=3)
        assert m.val == 4.0
        assert m.count == 4
        assert m.avg == (2.0 + 12.0) / 4

    def test_reset(self):
        m = AverageMeter()
        m.update(5.0)
        m.reset()
        assert m.avg == 0 and m.count == 0


class TestBuildModelFromCfg:
    def test_reflective_construction(self, tmp_path):
        cfg = tmp_path / "model.yaml"
        cfg.write_text(
            "type: rot_mvgaze_tpu.models.FeatRotationSymm\n"
            "params:\n  backbone_depth: 18\n  num_iter: 2\n"
        )
        model = build_model_from_cfg(str(cfg))
        assert model.backbone_depth == 18
        assert model.num_iter == 2

    def test_no_params(self, tmp_path):
        cfg = tmp_path / "m.yaml"
        cfg.write_text("type: rot_mvgaze_tpu.utils.AverageMeter\n")
        assert isinstance(build_model_from_cfg(str(cfg)), AverageMeter)


class TestConvBlockLibrary:
    def test_conv2dnet_shapes(self):
        """Mirror of the reference smoke block
        (/root/reference/models/backbones/blocks.py:135-142)."""
        net = Conv2dNet(
            features=[4, 5, 6], kernels=[4, 4, 5], strides=[2, 2, 2]
        )
        x = jnp.zeros((4, 128, 128, 3))
        vs = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(vs, x, mutable=False)
        assert out.shape[0] == 4 and out.shape[-1] == 6

    def test_conv_transpose_upsamples(self):
        net = Conv2dTransposeNet(features=[4, 2], kernels=[4, 4], strides=[2, 2])
        x = jnp.zeros((1, 8, 8, 3))
        vs = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(vs, x, mutable=False)
        assert out.shape[1] > 8 and out.shape[-1] == 2


class TestSetSeed:
    def test_returns_key_and_seeds_numpy(self):
        key = set_seed(42)
        a = np.random.rand(3)
        set_seed(42)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)
        assert key.shape == (2,) or key.dtype  # a PRNG key


class TestHostShard:
    def test_single_process_covers_all(self):
        start, stop = host_shard(100)
        assert (start, stop) == (0, 100)


def test_pad_rows_empty_input_raises():
    import pytest

    from rot_mvgaze_tpu.utils.padding import pad_rows

    with pytest.raises(ValueError, match="empty"):
        pad_rows(np.zeros((0, 3), np.float32), 4)
