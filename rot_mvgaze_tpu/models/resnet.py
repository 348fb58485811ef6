"""NHWC flax.linen ResNet family (18/34/50/101/152, ResNeXt, Wide).

Capability parity with /root/reference/models/resnet.py:50-399, re-designed
for TPU:

- NHWC layout end-to-end (the TPU-native conv layout; XLA tiles NHWC convs
  onto the MXU without transposes).
- The reference's ``forward`` applies avgpool and SKIPS ``fc``
  (/root/reference/models/resnet.py:261-275, ``take_avg=True``), and the
  wrapping Sequential applies a second, no-op avgpool
  (/root/reference/models/rot_mv.py:124-128). Both collapse to a single
  spatial mean here; ``__call__`` returns pooled ``(B, C)`` features by
  default. ``include_fc=True`` adds the classification head for standalone
  classification use.
- ``bn_axis_name`` enables cross-replica batch-stat ``pmean`` when the model
  runs under ``shard_map``/``pmap`` data parallelism (the reference trains
  single-device BN; syncing stats is the faithful scaled-up semantics).
- Compute dtype is configurable (bfloat16 for MXU throughput); params and BN
  statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch conv init: kaiming_normal(mode=fan_out, nonlinearity=relu)
# (/root/reference/models/resnet.py:203-205).
conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# ImageNet-pretrained torchvision checkpoints (the reference downloads these
# at construction, /root/reference/models/resnet.py:18-28,278-283). In
# zero-egress environments, download separately and pass the file to
# ``--pretrained_backbone`` / compat.load_pretrained_backbone.
MODEL_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "resnet152": "https://download.pytorch.org/models/resnet152-b121ed2d.pth",
    "resnext50_32x4d": "https://download.pytorch.org/models/resnext50_32x4d-7cdf4587.pth",
    "resnext101_32x8d": "https://download.pytorch.org/models/resnext101_32x8d-8ba56ff5.pth",
    "wide_resnet50_2": "https://download.pytorch.org/models/wide_resnet50_2-95faca4d.pth",
    "wide_resnet101_2": "https://download.pytorch.org/models/wide_resnet101_2-32ee1156.pth",
}


class QuantConv(nn.Module):
    """``nn.Conv`` twin (identical ``{kernel}`` param tree) whose forward
    runs the int8 MXU path (rot_mvgaze_tpu/ops/quant.py): per-channel weight
    scales, int32 accumulation, dequantized into ``dtype``. Any float
    checkpoint serves both paths.

    Activation scales: ``static=False`` computes a dynamic per-tensor scale
    each call (no calibration needed, but the abs-max reduce breaks fusion);
    ``static=True`` keeps a calibrated running abs-max in the ``quant``
    variable collection — run forward passes with ``mutable=["quant"]`` to
    calibrate (those passes quantize dynamically while recording the range),
    then frozen passes quantize with the stored scale as a pure elementwise
    op (measured 1.24x bf16 end-to-end vs 0.85x for dynamic; docs/PERF.md).
    """

    features: int
    kernel_size: int
    strides: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from rot_mvgaze_tpu.ops.quant import int8_conv

        k = self.kernel_size
        in_ch = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel", conv_kaiming_init,
            (k, k, in_ch, self.features), self.param_dtype,
        )
        act_scale = None
        if self.static:
            amax = self.variable(
                "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
            )
            if self.is_mutable_collection("quant"):
                if not self.is_initializing():
                    amax.value = jnp.maximum(
                        amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                    )
                # calibration pass: quantize dynamically (exact range for
                # THIS batch) while the running max accumulates
            else:
                # Never-calibrated guard: a zero running max would make the
                # scale ~1e-8 and clip every activation to garbage. Fall
                # back to a conservative fixed range (post-BN/ReLU
                # activations rarely exceed |8|) — degraded precision, not
                # silent nonsense. Calibrate for full accuracy.
                amax_eff = jnp.where(
                    amax.value > 0, amax.value, jnp.float32(8.0)
                )
                act_scale = amax_eff / 127.0
        pad = k // 2
        return int8_conv(
            x, kernel, (self.strides, self.strides),
            [(pad, pad), (pad, pad)],
            feature_group_count=self.groups, out_dtype=self.dtype,
            act_scale=act_scale,
        )


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, with optionally fused residual-add and
    ReLU — the ResNet primitive.

    With ``use_pallas_bn`` the training-mode BN (+act+residual) runs through
    the Pallas fused kernels (rot_mvgaze_tpu/ops/batchnorm.py); otherwise
    flax ``nn.BatchNorm`` with the act/residual applied as plain XLA ops.
    Both paths share the exact parameter/stat tree layout.
    """

    features: int
    kernel_size: int
    strides: int = 1
    groups: int = 1
    act: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas_bn: bool = False
    # ghost-stat subsampling (see TorchBatchNorm.stat_subsample); XLA path
    # only — combining with use_pallas_bn is rejected rather than ignored
    bn_stat_subsample: int = 1
    int8: Any = False  # False | True (dynamic scales) | "static" (calibrated)
    conv_name: str = "conv"
    bn_name: str = "bn"
    bn_scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool,
        residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        pad = self.kernel_size // 2
        if self.int8 and not train:
            x = QuantConv(
                self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                groups=self.groups,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                static=self.int8 == "static",
                name=self.conv_name,
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=conv_kaiming_init,
                name=self.conv_name,
            )(x)
        if self.use_pallas_bn:
            if self.bn_stat_subsample != 1:
                raise ValueError(
                    "bn_stat_subsample is only implemented on the default "
                    "TorchBatchNorm path, not the Pallas BN kernels"
                )
            if self.bn_axis_name is not None:
                raise ValueError(
                    "use_pallas_bn has no cross-replica batch-stat sync: "
                    "under data parallelism (bn_axis_name set) each replica "
                    "would silently train on per-shard statistics. Use the "
                    "default TorchBatchNorm path for multi-device training."
                )
            from rot_mvgaze_tpu.models.norm import PallasBatchNormAct

            return PallasBatchNormAct(
                momentum=0.9,
                epsilon=1e-5,
                relu=self.act,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                scale_init=self.bn_scale_init,
                name=self.bn_name,
            )(x, train=train, residual=residual)
        from rot_mvgaze_tpu.models.norm import TorchBatchNorm

        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch BN momentum 0.1 == flax momentum 0.9
            epsilon=1e-5,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            scale_init=self.bn_scale_init,
            stat_subsample=self.bn_stat_subsample,
            name=self.bn_name,
        )(x)
        if residual is not None:
            x = x + residual
        if self.act:
            x = nn.relu(x)
        return x


def _pallas_bn_flags(use_pallas_bn) -> tuple:
    """(body_bns, tail_bn): per-position Pallas-BN enables.

    ``use_pallas_bn`` accepts ``True`` (every BN — the r1 experiment,
    measured negative: opaque kernels break XLA's conv-chain fusions) or
    ``"residual"`` (ONLY the block-tail BN, where BN + residual-add + ReLU
    meet — the r3 bounded attempt at the `add_add_fusion` pass traffic
    identified in docs/PERF.md; the body BNs stay inside XLA's fusion
    domain)."""
    if use_pallas_bn not in (False, True, "residual"):
        raise ValueError(
            f"use_pallas_bn must be False, True, or 'residual', got "
            f"{use_pallas_bn!r}"
        )
    body = use_pallas_bn is True
    tail = use_pallas_bn in (True, "residual")
    return body, tail


def min_spatial_shard_rows(h: int, n_shards: int) -> int:
    """Valid rows of the SMALLEST shard when GSPMD shards a height-``h``
    axis ``n_shards`` ways: even shards of ceil(h/n) rows, the axis padded
    at the end — so the last shard holds the remainder and can have fewer
    (even <= 0) valid rows than the others. The spatial floor must bound
    THIS value, not ``h // n``: e.g. h=10, n=4 → shards of 3 rows, the
    last holding 10 - 3*3 = 1 valid row (the XLA SPMD backward-mis-compile
    regime), although 10 >= 2*4."""
    per_shard = -(-h // n_shards)
    return h - (n_shards - 1) * per_shard


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity shortcut (/root/reference/models/resnet.py:50-96)."""

    planes: int
    strides: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas_bn: Any = False  # False | True | "residual" (tail BN only)
    bn_stat_subsample: int = 1  # ghost-stat subsampling (TorchBatchNorm)
    int8: Any = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.groups != 1 or self.base_width != 64:
            # torchvision raises here too (BasicBlock only supports
            # groups=1/base_width=64); silently ignoring the fields would
            # train a plain net under a grouped/wide config
            raise ValueError(
                "BasicBlock only supports groups=1 and base_width=64; "
                f"got groups={self.groups}, base_width={self.base_width}"
            )
        body_pallas, tail_pallas = _pallas_bn_flags(self.use_pallas_bn)
        common = dict(
            dtype=self.dtype, param_dtype=self.param_dtype,
            bn_axis_name=self.bn_axis_name, use_pallas_bn=body_pallas,
            bn_stat_subsample=self.bn_stat_subsample, int8=self.int8,
        )
        identity = x
        if self.has_downsample:
            identity = ConvBN(
                self.planes * self.expansion, 1, self.strides,
                conv_name="conv", bn_name="bn", name="downsample", **common,
            )(x, train)
        out = ConvBN(
            self.planes, 3, self.strides, act=True,
            conv_name="conv1", bn_name="bn1", name="cb1", **common,
        )(x, train)
        # bn2 + residual add + relu fused
        out = ConvBN(
            self.planes, 3, 1, act=True,
            conv_name="conv2", bn_name="bn2", name="cb2",
            bn_scale_init=(
                nn.initializers.zeros
                if self.zero_init_residual
                else nn.initializers.ones
            ),
            **{**common, "use_pallas_bn": tail_pallas},
        )(out, train, residual=identity)
        return out


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (/root/reference/models/resnet.py:99-148)."""

    planes: int
    strides: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas_bn: Any = False  # False | True | "residual" (tail BN only)
    bn_stat_subsample: int = 1  # ghost-stat subsampling (TorchBatchNorm)
    int8: Any = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        body_pallas, tail_pallas = _pallas_bn_flags(self.use_pallas_bn)
        common = dict(
            dtype=self.dtype, param_dtype=self.param_dtype,
            bn_axis_name=self.bn_axis_name, use_pallas_bn=body_pallas,
            bn_stat_subsample=self.bn_stat_subsample, int8=self.int8,
        )
        identity = x
        if self.has_downsample:
            identity = ConvBN(
                self.planes * self.expansion, 1, self.strides,
                conv_name="conv", bn_name="bn", name="downsample", **common,
            )(x, train)
        out = ConvBN(
            width, 1, 1, act=True,
            conv_name="conv1", bn_name="bn1", name="cb1", **common,
        )(x, train)
        out = ConvBN(
            width, 3, self.strides, groups=self.groups, act=True,
            conv_name="conv2", bn_name="bn2", name="cb2", **common,
        )(out, train)
        # bn3 + residual add + relu fused
        out = ConvBN(
            self.planes * self.expansion, 1, 1, act=True,
            conv_name="conv3", bn_name="bn3", name="cb3",
            bn_scale_init=(
                nn.initializers.zeros
                if self.zero_init_residual
                else nn.initializers.ones
            ),
            **{**common, "use_pallas_bn": tail_pallas},
        )(out, train, residual=identity)
        return out


class ResNet(nn.Module):
    """NHWC ResNet backbone returning pooled features (B, C).

    ``stage_sizes``/``block_cls`` select the depth; ``groups``/
    ``width_per_group`` select ResNeXt/Wide variants, mirroring
    /root/reference/models/resnet.py:151-259.
    """

    stage_sizes: Sequence[int]
    block_cls: Type[nn.Module]
    num_classes: int = 1000
    include_fc: bool = False
    groups: int = 1
    width_per_group: int = 64
    in_channels: int = 3
    zero_init_residual: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    # False | True (every BN via Pallas — r1, measured negative) |
    # "residual" (block-tail BNs only, where BN+residual+ReLU meet — r3)
    use_pallas_bn: Any = False
    # Ghost-stat subsampling: train-mode BN statistics from every k-th batch
    # row (TorchBatchNorm.stat_subsample; r3 perf experiment, opt-in
    # training-dynamics deviation like fuse_views)
    bn_stat_subsample: int = 1
    # Run convolutions on the int8 MXU path at eval (ops/quant.py); the
    # training path is unchanged. False | True (dynamic activation scales) |
    # "static" (calibrated scales in the `quant` collection — fastest).
    int8: Any = False
    # Rematerialize each residual block on the backward pass (jax.checkpoint)
    # — trades ~30% more FLOPs for O(depth) less activation memory, enabling
    # much larger per-chip batches.
    remat: bool = False
    # Spatial-partitioning floor, set by the trainer/server on a 2-D
    # (data, spatial) mesh: ``(spatial_size, sharding)`` where ``sharding``
    # drops the height axis (P('data')). Before any stage whose output
    # would leave < 2 valid rows per spatial shard, activations are
    # re-pinned to ``sharding`` — gathering the height axis for the
    # remaining (compute-trivial) tail. Two reasons: (a) halo exchange
    # dominates compute at such extents; (b) XLA's SPMD partitioner
    # mis-compiles the BACKWARD of a residual block whose conv output has
    # exactly 1 row per shard — deterministic wrong gradients with an
    # exact forward (repro + regression coverage:
    # tests/test_spatial_partition.py::test_spatial_floor_protects_tiny_extents).
    spatial_unshard: Optional[Any] = None

    @property
    def feature_dim(self) -> int:
        return 512 * self.block_cls.expansion

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.use_pallas_bn and self.bn_axis_name is not None:
            raise ValueError(
                "use_pallas_bn has no cross-replica batch-stat sync; "
                "use the default BN path under data parallelism"
            )
        if x.shape[-1] != self.in_channels:
            raise ValueError(
                f"ResNet configured for in_channels={self.in_channels}, "
                f"got input with {x.shape[-1]} channels"
            )
        x = x.astype(self.dtype)

        # --- spatial-partitioning floor (see the spatial_unshard field) ---
        spatial_sharded = self.spatial_unshard is not None

        def floor_check(x: jnp.ndarray, total_stride: int) -> jnp.ndarray:
            # Gather the height axis BEFORE a stage whose output would
            # leave < 2 valid rows in ANY spatial shard. GSPMD pads the
            # axis to even shards of ceil(H/n) rows, so the LAST shard can
            # hold fewer valid rows than the rest — the bound must be on
            # min_spatial_shard_rows, not H_out >= 2n (e.g. H_out=10 over
            # n=4 gives shards 3,3,3,1: the 1-valid-row mis-compile regime
            # despite 10 >= 8).
            nonlocal spatial_sharded
            if not spatial_sharded:
                return x
            n_spatial, sharding = self.spatial_unshard
            h_out = x.shape[1] // total_stride
            if min_spatial_shard_rows(h_out, n_spatial) < 2:
                spatial_sharded = False
                return jax.lax.with_sharding_constraint(x, sharding)
            return x

        x = floor_check(x, 4)  # stem: conv1 (s2) + maxpool (s2)
        if self.int8 and not train:
            x = QuantConv(
                64, kernel_size=7, strides=2,
                dtype=self.dtype, param_dtype=self.param_dtype,
                static=self.int8 == "static", name="conv1",
            )(x)
        else:
            x = nn.Conv(
                64, kernel_size=(7, 7), strides=(2, 2),
                padding=[(3, 3), (3, 3)], use_bias=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
                kernel_init=conv_kaiming_init, name="conv1",
            )(x)
        if self.use_pallas_bn is True:  # stem BN has no residual; body-only
            from rot_mvgaze_tpu.models.norm import PallasBatchNormAct

            x = PallasBatchNormAct(
                momentum=0.9, epsilon=1e-5, relu=True,
                dtype=self.dtype, param_dtype=self.param_dtype, name="bn1",
            )(x, train=train)
        else:
            from rot_mvgaze_tpu.models.norm import TorchBatchNorm

            x = TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.bn_axis_name,
                stat_subsample=self.bn_stat_subsample,
                dtype=self.dtype, param_dtype=self.param_dtype, name="bn1",
            )(x)
            x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): -inf padding. (A
        # scatter-free 9-candidate-max rewrite lives in ops/pooling.py;
        # measured 23% SLOWER end-to-end — see docs/PERF.md negative
        # results — so the reduce_window/select_and_scatter form stays.)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        block_cls = (
            nn.remat(self.block_cls, static_argnums=(2,))
            if self.remat
            else self.block_cls
        )
        expansion = self.block_cls.expansion
        inplanes = 64
        for stage_i, (planes, num_blocks) in enumerate(
            zip((64, 128, 256, 512), self.stage_sizes)
        ):
            strides = 1 if stage_i == 0 else 2
            x = floor_check(x, strides)
            for block_i in range(num_blocks):
                block_strides = strides if block_i == 0 else 1
                has_down = block_i == 0 and (
                    block_strides != 1 or inplanes != planes * expansion
                )
                x = block_cls(
                    planes=planes,
                    strides=block_strides,
                    has_downsample=has_down,
                    groups=self.groups,
                    base_width=self.width_per_group,
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    bn_axis_name=self.bn_axis_name,
                    use_pallas_bn=self.use_pallas_bn,
                    bn_stat_subsample=self.bn_stat_subsample,
                    int8=self.int8,
                    name=f"layer{stage_i + 1}_{block_i}",
                )(x, train)
                inplanes = planes * expansion

        # Global average pool == the reference's AdaptiveAvgPool2d((1,1)) +
        # Flatten (the second avgpool in rot_mv.py:124-128 is a no-op).
        x = jnp.mean(x, axis=(1, 2))

        if self.include_fc:
            x = nn.Dense(
                self.num_classes,
                dtype=self.dtype, param_dtype=self.param_dtype, name="fc",
            )(x)
        return x


def resnet18(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, **kwargs)


def resnet34(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, **kwargs)


def resnet50(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, **kwargs)


def resnet101(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck, **kwargs)


def resnet152(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), block_cls=Bottleneck, **kwargs)


def resnext50_32x4d(**kwargs) -> ResNet:
    return ResNet(
        stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
        groups=32, width_per_group=4, **kwargs,
    )


def resnext101_32x8d(**kwargs) -> ResNet:
    return ResNet(
        stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck,
        groups=32, width_per_group=8, **kwargs,
    )


def wide_resnet50_2(**kwargs) -> ResNet:
    return ResNet(
        stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
        width_per_group=128, **kwargs,
    )


def wide_resnet101_2(**kwargs) -> ResNet:
    return ResNet(
        stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck,
        width_per_group=128, **kwargs,
    )


BACKBONES = {
    18: resnet18,
    34: resnet34,
    50: resnet50,
    101: resnet101,
    152: resnet152,
    # name-keyed variants (/root/reference/models/resnet.py:326-399);
    # the plain nets are addressable by name too
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
    "resnext50_32x4d": resnext50_32x4d,
    "resnext101_32x8d": resnext101_32x8d,
    "wide_resnet50_2": wide_resnet50_2,
    "wide_resnet101_2": wide_resnet101_2,
}
