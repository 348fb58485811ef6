"""ops/conv_bn.py — the Pallas conv+BN-stat-epilogue experiment kernel.

Correctness only (CPU interpret mode); the performance verdict lives in
scripts/probe_conv_bn_epilogue.py + docs/PERF.md "Conv-epilogue BN stats".
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import rot_mvgaze_tpu.ops.conv_bn as conv_bn


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(scale * rng.standard_normal(shape), jnp.float32)


class TestConv3x3BnStats:
    @pytest.mark.parametrize("batch_tile", [2, 4])
    def test_matches_xla_conv(self, batch_tile):
        x = _rand((4, 6, 6, 128))
        w = _rand((3, 3, 128, 128), seed=1, scale=0.05)
        out, stats = conv_bn.conv3x3_bn_stats(x, w, batch_tile=batch_tile)
        ref, ref_stats = conv_bn.conv3x3_bn_stats_reference(x, w)
        # same bf16 inputs, f32 accumulation both sides: only the 9-GEMM
        # summation order differs from XLA's conv
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=0,
        )
        # per-channel SUMS cancel (zero-mean data), so pure-relative
        # comparison is ill-conditioned; the absolute term covers the
        # bf16-input rounding accumulated over the 144-row reduction
        np.testing.assert_allclose(
            np.asarray(stats), np.asarray(ref_stats), rtol=5e-3, atol=1.0
        )

    def test_stats_accumulate_across_grid(self):
        # grid of 4 programs: stats must cover ALL rows, not the last block
        x = _rand((8, 4, 4, 128), seed=2)
        w = _rand((3, 3, 128, 128), seed=3, scale=0.05)
        out, stats = conv_bn.conv3x3_bn_stats(x, w, batch_tile=2)
        flat = np.asarray(out, np.float32).reshape(-1, 128)
        # stats come from the f32 accumulator; `flat` is the bf16-cast
        # output, so allow its quantization over the 128-row reduction
        np.testing.assert_allclose(
            np.asarray(stats[0]), flat.sum(0), rtol=5e-3, atol=1.0
        )

    def test_zero_padding_at_borders(self):
        # an input with mass ONLY at the corner: conv must see zeros
        # beyond the border, not wrapped values
        x = jnp.zeros((2, 4, 4, 128), jnp.float32)
        x = x.at[:, 0, 0, :].set(1.0)
        w = _rand((3, 3, 128, 128), seed=4, scale=0.05)
        out, _ = conv_bn.conv3x3_bn_stats(x, w, batch_tile=2)
        ref, _ = conv_bn.conv3x3_bn_stats_reference(x, w)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=0,
        )

    def test_rejects_bad_shapes(self):
        x = _rand((4, 6, 6, 128))
        with pytest.raises(ValueError, match="batch_tile"):
            conv_bn.conv3x3_bn_stats(x, _rand((3, 3, 128, 128)),
                                     batch_tile=3)
        with pytest.raises(ValueError, match="w must be"):
            conv_bn.conv3x3_bn_stats(x, _rand((5, 5, 128, 128)),
                                     batch_tile=2)
