"""Rotation-constrained cross-view gaze fusion model (the paper's model).

Capability parity with /root/reference/models/rot_mv.py:13-269, rebuilt as a
flax.linen module over NHWC inputs with a dict-pytree in/out contract (same
keys as the reference so losses/trainer compose identically):

input  : {img_0, img_1, rot_0, rot_1, ...}
output : input ∪ {num_iter, img_feat_{0,1}, initial_rot_feat_{0,1},
                  iter_{i}: {feat_0, feat_1, pred_gaze_0, pred_gaze_1},
                  pred_gaze}

Forward math per iteration i (default path,
/root/reference/models/rot_mv.py:193-239)::

    rot_10 = R0 @ R1^T ;  rot_01 = R1 @ R0^T
    f0' = fuser_i(img_feat_0, rot_10 @ f1)
    f1' = fuser_i(img_feat_1, rot_01 @ f0)     # uses PRE-update f0
    g0  = head_i([img_feat_0, f0'])
    g1  = head_i([img_feat_1, f1'])

The iteration count is static, so the loop is unrolled at trace time — XLA
sees a flat chain of large batched matmuls (MXU-friendly), no dynamic control
flow. Variant paths (encode_rotmat / ignore_rotmat / share_feature /
share_weights) mirror /root/reference/models/rot_mv.py:136-158,219-254.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rot_mvgaze_tpu.models.blocks import Mlp
from rot_mvgaze_tpu.models.resnet import BACKBONES

NUM_FEAT_VEC = 512


class IntensityBatchNorm(nn.Module):
    """Normalizes rotatable features by a running std of per-vector norms.

    Parity with /root/reference/models/rot_mv.py:13-32. Despite the buffer's
    name (``running_mean``), it tracks a running *std* of the feature-vector
    intensity ``||x||_2`` over the batch; momentum 0.05, eps 1e-4. During
    training the buffer is updated BEFORE the division (the reference divides
    by the freshly updated value). With ``axis_name`` set, batch statistics
    are computed over the global (cross-replica) batch.
    """

    n_channels: int
    momentum: float = 0.05
    eps: float = 1e-4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        running = self.variable(
            "batch_stats",
            "running_mean",
            lambda: jnp.ones((1, 1, self.n_channels), jnp.float32),
        )
        if train:
            # [B, 1, C]: L2 norm over the 3-dim rotation axis, no gradient.
            intensity = jax.lax.stop_gradient(
                jnp.linalg.norm(x.astype(jnp.float32), axis=-2, keepdims=True)
            )
            mean = jnp.mean(intensity, axis=0, keepdims=True)
            mean_sq = jnp.mean(jnp.square(intensity), axis=0, keepdims=True)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            var = mean_sq - jnp.square(mean)  # biased, as torch unbiased=False
            std = jnp.sqrt(jnp.maximum(var, self.eps))
            new_running = running.value * (1 - self.momentum) + std * self.momentum
            if not self.is_initializing():
                running.value = new_running
            denom = new_running
        else:
            denom = running.value
        return x / (denom + self.eps).astype(x.dtype)


class _DenseParams(nn.Module):
    """Parameter holder with torch.nn.Linear-compatible init and the exact
    param-tree layout of nn.Dense ({kernel, bias}) — lets the Pallas fused
    path share checkpoints with the Mlp path."""

    fan_in: int
    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self) -> tuple:
        from rot_mvgaze_tpu.models.blocks import torch_linear_init

        kinit, binit = torch_linear_init(self.fan_in)
        kernel = self.param(
            "kernel", kinit, (self.fan_in, self.features), self.param_dtype
        )
        bias = self.param("bias", binit, (self.features,), self.param_dtype)
        return kernel, bias


class _FusedFuserMlp(nn.Module):
    """Pallas-backed twin of the 2-layer fuser Mlp: identical params
    (``dense_0``/``dense_1``), rotation folded into the first GEMM
    (rot_mvgaze_tpu.ops.fusion)."""

    in_dim: int
    hidden: int
    out: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, img_feat: jnp.ndarray, rot_feat: jnp.ndarray, rot: jnp.ndarray
    ) -> jnp.ndarray:
        from rot_mvgaze_tpu.ops.fusion import fused_image_feat_fuser

        w1, b1 = _DenseParams(
            self.in_dim, self.hidden, self.param_dtype, name="dense_0"
        )()
        w2, b2 = _DenseParams(
            self.hidden, self.out, self.param_dtype, name="dense_1"
        )()
        return fused_image_feat_fuser(
            img_feat.astype(self.dtype),
            rot_feat.astype(self.dtype),
            rot,
            w1.astype(self.dtype),
            b1.astype(jnp.float32),
            w2.astype(self.dtype),
            b2.astype(jnp.float32),
        )


class ImageFeatFuser(nn.Module):
    """MLP fusing a view's image feature with the (rotated) other-view
    rotatable feature. Parity: /root/reference/models/rot_mv.py:35-50.

    Called as ``fuser(img_feat, other_feat, rot)``: the relative rotation is
    applied inside (fused into the first GEMM on the Pallas path). Pass
    ``rot=None`` to fuse the unrotated feature (ignore_rotmat ablation,
    /root/reference/models/rot_mv.py:226-232).
    """

    img_feat_dim: int
    num_feat_vec: int = NUM_FEAT_VEC
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        img_feat: jnp.ndarray,
        rotatable_feat: jnp.ndarray,
        rot: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        in_channel = self.img_feat_dim + self.num_feat_vec * 3
        if self.use_pallas and rot is not None:
            return _FusedFuserMlp(
                in_dim=in_channel,
                hidden=in_channel,
                out=self.num_feat_vec * 3,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="fuser",
            )(img_feat, rotatable_feat, rot)
        if rot is not None:
            rotatable_feat = _rotate(rot, rotatable_feat)
        flat = rotatable_feat.reshape(*rotatable_feat.shape[:-2], -1)
        in_feat = jnp.concatenate([img_feat, flat], axis=-1)
        return Mlp(
            features=[in_channel, self.num_feat_vec * 3],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fuser",
        )(in_feat)


def _rotate(rot: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
    """(B,3,3) @ (B,3,V): small contraction dim — full precision."""
    return jnp.einsum(
        "bij,bjv->biv",
        rot,
        feat.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(feat.dtype)


class ImageRotmatFeatFuser(nn.Module):
    """Fuser variant that concatenates the raw relative rotation matrix and
    fuses the UN-rotated other-view feature; 3-layer MLP.
    Parity: /root/reference/models/rot_mv.py:53-67."""

    img_feat_dim: int
    num_feat_vec: int = NUM_FEAT_VEC
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, img_feat: jnp.ndarray, rotatable_feat: jnp.ndarray, rot: jnp.ndarray
    ) -> jnp.ndarray:
        in_channel = self.img_feat_dim + self.num_feat_vec * 3 + 9
        flat = rotatable_feat.reshape(*rotatable_feat.shape[:-2], -1)
        rot_flat = rot.reshape(*rot.shape[:-2], -1).astype(img_feat.dtype)
        in_feat = jnp.concatenate([img_feat, flat, rot_flat], axis=-1)
        return Mlp(
            features=[in_channel, in_channel, self.num_feat_vec * 3],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fuser",
        )(in_feat)


class RotFeatFuser(nn.Module):
    """share_feature variant: intensity-normalized rotatable features from
    both views, concatenated channel-wise. Parity:
    /root/reference/models/rot_mv.py:70-85."""

    num_feat_vec: int = NUM_FEAT_VEC
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        feat_0: jnp.ndarray,
        feat_1: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        in_channel = self.num_feat_vec * 6
        bn = IntensityBatchNorm(
            self.num_feat_vec, axis_name=self.bn_axis_name, name="batchnorm"
        )
        f0 = bn(feat_0, train)
        f1 = bn(feat_1, train)
        in_feat = jnp.concatenate([f0, f1], axis=-1)
        in_feat = in_feat.reshape(*in_feat.shape[:-2], -1)
        out = Mlp(
            features=[in_channel, in_channel, 3 * self.num_feat_vec],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fuser",
        )(in_feat)
        return out.reshape(-1, 3, self.num_feat_vec)


class Feat3dLifter(nn.Module):
    """Lifts a backbone feature to a rotatable (3, num_feat_vec) matrix.
    Parity: /root/reference/models/rot_mv.py:91-98. Shared across views and
    iterations."""

    num_feat_vec: int = NUM_FEAT_VEC
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_feat: jnp.ndarray) -> jnp.ndarray:
        out = Mlp(
            features=[self.num_feat_vec * 3, self.num_feat_vec * 3],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="lifter",
        )(in_feat)
        return out.reshape(-1, 3, self.num_feat_vec)


class FeatRotationSymm(nn.Module):
    """Twin-backbone, iterative rotation-constrained cross-view fusion.

    Parity target: /root/reference/models/rot_mv.py:102-269 with the shipped
    config ``(backbone_depth=50, num_iter=3, share_weights=False,
    encode_rotmat=False, share_feature=False, ignore_rotmat=False)``
    (/root/reference/main.py:231-236). All ablation paths supported.
    """

    # int depth (18/34/50/101/152) or a variant name from BACKBONES
    # ('resnext50_32x4d', 'wide_resnet50_2', ...)
    backbone_depth: Any = 50
    num_iter: int = 3
    share_weights: bool = False
    encode_rotmat: bool = False
    share_feature: bool = False
    ignore_rotmat: bool = False
    num_feat_vec: int = NUM_FEAT_VEC
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    use_pallas_fusion: bool = False
    # Pallas fused train-mode BatchNorm(+ReLU+residual) in the backbone —
    # the profiled hot path (see rot_mvgaze_tpu/ops/batchnorm.py).
    # False | True (all BNs) | "residual" (block-tail BNs only; see
    # models/resnet.py _pallas_bn_flags + docs/PERF.md r3)
    use_pallas_bn: Any = False
    # Ghost-stat subsampling: backbone train-mode BN statistics from every
    # k-th batch row (models/norm.py TorchBatchNorm.stat_subsample) — an
    # opt-in training-dynamics deviation like fuse_views; r3 perf experiment
    # (docs/PERF.md). 1 = exact reference semantics.
    bn_stat_subsample: int = 1
    # int8 MXU backbone convs at eval/serving (ops/quant.py); train path
    # unaffected; same checkpoints. False | True (dynamic activation scales)
    # | "static" (calibrated scales in the `quant` collection: 1.24x bf16
    # serving throughput on v5e; calibrate with mutable=["quant"] passes).
    int8_backbone: Any = False
    # Rematerialize backbone blocks on backward (larger per-chip batches).
    remat: bool = False
    # Spatial-partitioning floor for 2-D (data, spatial) meshes:
    # ``(spatial_size, sharding)`` forwarded to the backbone (see
    # models/resnet.py ResNet.spatial_unshard). Set by the trainer/server.
    spatial_unshard: Optional[Any] = None
    # Run both views through the backbone as ONE concatenated batch (bigger
    # GEMMs, one kernel sequence). Always done at eval (numerically identical
    # there — BN uses running stats). At train it merges the two views'
    # BatchNorm batch statistics, which deviates from the reference's
    # per-view stats (/root/reference/models/rot_mv.py:196-197), so it is
    # opt-in for training.
    fuse_views: bool = False

    def setup(self) -> None:
        assert not (self.ignore_rotmat and self.encode_rotmat)
        if self.share_feature and (self.encode_rotmat or self.share_weights):
            # Both combos are unconstructible in the reference: with
            # encode_rotmat its forward calls the 2-arg RotFeatFuser with 3
            # args (/root/reference/models/rot_mv.py:219-225,80); with
            # share_weights its constructor picks ImageFeatFuser over
            # RotFeatFuser (:151-158) and the forward then feeds it a
            # (B,3,512) tensor where (B,2048) is expected. No reference
            # checkpoint of either shape can exist — refuse rather than
            # invent semantics the paper never trained.
            raise ValueError(
                "share_feature cannot be combined with encode_rotmat or "
                "share_weights (these combinations crash in the reference "
                "model and have no trained counterpart)"
            )
        if self.use_pallas_fusion and (
            self.ignore_rotmat or self.encode_rotmat or self.share_feature
        ):
            raise ValueError(
                "use_pallas_fusion covers only the default fuser path "
                "(ImageFeatFuser with a rotation input); with "
                "ignore_rotmat/encode_rotmat/share_feature the flag would "
                "be silently inert — benchmark conclusions drawn from it "
                "would measure the plain XLA path"
            )
        if self.fuse_views and self.bn_stat_subsample > 1:
            raise ValueError(
                "fuse_views=True stacks the batch as [view0; view1], so "
                "bn_stat_subsample's contiguous-prefix slice would compute "
                "BN statistics from view-0 rows ONLY (systematic, not the "
                "documented i.i.d. subsample). Use one or the other."
            )
        backbone_ctor = BACKBONES[self.backbone_depth]
        self.backbone = backbone_ctor(
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            bn_axis_name=self.bn_axis_name,
            use_pallas_bn=self.use_pallas_bn,
            bn_stat_subsample=self.bn_stat_subsample,
            int8=self.int8_backbone,
            remat=self.remat,
            spatial_unshard=self.spatial_unshard,
            name="backbone",
        )
        fc_dim = self.backbone.feature_dim
        self.lifter = Feat3dLifter(
            self.num_feat_vec,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="lifter",
        )

        if self.encode_rotmat:
            fuser_cls = ImageRotmatFeatFuser
        else:
            fuser_cls = ImageFeatFuser

        def make_fuser(i: int):
            if self.share_feature:
                return RotFeatFuser(
                    self.num_feat_vec,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"img_fuser_{i}",
                )
            kwargs = {}
            if fuser_cls is ImageFeatFuser:
                kwargs["use_pallas"] = self.use_pallas_fusion
            return fuser_cls(
                fc_dim,
                self.num_feat_vec,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"img_fuser_{i}",
                **kwargs,
            )

        def make_head(i: int):
            # Input dim (num_feat_vec*3 + fc_dim, or num_feat_vec*6 for
            # share_feature) is inferred by flax Dense at first call.
            return Mlp(
                features=[512, 2],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"gaze_estimator_{i}",
            )

        # share_weights: ONE instance called num_iter times == torch's
        # [module]*num_iter aliasing (/root/reference/models/rot_mv.py:151-158).
        n_distinct = 1 if self.share_weights else self.num_iter
        self.img_fusers = [make_fuser(i) for i in range(n_distinct)]
        self.gaze_estimators = [make_head(i) for i in range(n_distinct)]

    def __call__(
        self, data: Dict[str, Any], train: bool = False
    ) -> Dict[str, Any]:
        img_0, img_1 = data["img_0"], data["img_1"]
        rot_0 = data["rot_0"].astype(jnp.float32)
        rot_1 = data["rot_1"].astype(jnp.float32)

        # Relative rotations; tiny 3x3 composes — keep full precision.
        rot_10 = jnp.einsum(
            "bij,bkj->bik", rot_0, rot_1, precision=jax.lax.Precision.HIGHEST
        )
        rot_01 = jnp.einsum(
            "bij,bkj->bik", rot_1, rot_0, precision=jax.lax.Precision.HIGHEST
        )

        if self.fuse_views or not train:
            both = self.backbone(jnp.concatenate([img_0, img_1], axis=0), train)
            lifted = self.lifter(both)
            img_feat_0, img_feat_1 = jnp.split(both, 2, axis=0)
            rotatable_feat_0, rotatable_feat_1 = jnp.split(lifted, 2, axis=0)
        else:
            img_feat_0 = self.backbone(img_0, train)
            img_feat_1 = self.backbone(img_1, train)
            rotatable_feat_0 = self.lifter(img_feat_0)
            rotatable_feat_1 = self.lifter(img_feat_1)

        if self.share_feature:
            img_feat_0 = rotatable_feat_0
            img_feat_1 = rotatable_feat_1

        pred: Dict[str, Any] = {
            "num_iter": self.num_iter,
            "img_feat_0": img_feat_0,
            "img_feat_1": img_feat_1,
            "initial_rot_feat_0": rotatable_feat_0,
            "initial_rot_feat_1": rotatable_feat_1,
        }

        for f_i in range(self.num_iter):
            m_i = 0 if self.share_weights else f_i
            img_fuser = self.img_fusers[m_i]
            gaze_estimator = self.gaze_estimators[m_i]
            feat_0_prev = rotatable_feat_0

            if self.share_feature:
                # ignore_rotmat composes with share_feature in the reference:
                # its forward branches on ignore_rotmat BEFORE the rotating
                # else-branch (/root/reference/models/rot_mv.py:226-232), so
                # the RotFeatFuser consumes the UN-rotated partner feature
                # in that ablation combo.
                if self.ignore_rotmat:
                    partner_1, partner_0 = rotatable_feat_1, feat_0_prev
                else:
                    partner_1 = _rotate(rot_10, rotatable_feat_1)
                    partner_0 = _rotate(rot_01, feat_0_prev)
                rotatable_feat_0 = img_fuser(img_feat_0, partner_1, train)
                rotatable_feat_1 = img_fuser(img_feat_1, partner_0, train)
                # NOTE: img_feat_{0,1} alias the INITIAL rotatable feats here
                # (set above), matching /root/reference/models/rot_mv.py:201-203.
            elif self.encode_rotmat:
                rotatable_feat_0 = img_fuser(
                    img_feat_0, rotatable_feat_1, rot_10
                ).reshape(-1, 3, self.num_feat_vec)
                rotatable_feat_1 = img_fuser(
                    img_feat_1, feat_0_prev, rot_01
                ).reshape(-1, 3, self.num_feat_vec)
            elif self.ignore_rotmat:
                rotatable_feat_0 = img_fuser(img_feat_0, rotatable_feat_1).reshape(
                    -1, 3, self.num_feat_vec
                )
                rotatable_feat_1 = img_fuser(img_feat_1, feat_0_prev).reshape(
                    -1, 3, self.num_feat_vec
                )
            else:
                rotatable_feat_0 = img_fuser(
                    img_feat_0, rotatable_feat_1, rot_10
                ).reshape(-1, 3, self.num_feat_vec)
                rotatable_feat_1 = img_fuser(
                    img_feat_1, feat_0_prev, rot_01
                ).reshape(-1, 3, self.num_feat_vec)

            if self.share_feature:
                head_in_0 = jnp.concatenate(
                    [img_feat_0, rotatable_feat_0], axis=-1
                ).reshape(img_feat_0.shape[0], -1)
                head_in_1 = jnp.concatenate(
                    [img_feat_1, rotatable_feat_1], axis=-1
                ).reshape(img_feat_1.shape[0], -1)
            else:
                head_in_0 = jnp.concatenate(
                    [img_feat_0, rotatable_feat_0.reshape(img_feat_0.shape[0], -1)],
                    axis=-1,
                )
                head_in_1 = jnp.concatenate(
                    [img_feat_1, rotatable_feat_1.reshape(img_feat_1.shape[0], -1)],
                    axis=-1,
                )
            pred_gaze_0 = gaze_estimator(head_in_0)
            pred_gaze_1 = gaze_estimator(head_in_1)

            pred[f"iter_{f_i}"] = {
                "feat_0": rotatable_feat_0,
                "feat_1": rotatable_feat_1,
                "pred_gaze_0": pred_gaze_0,
                "pred_gaze_1": pred_gaze_1,
            }

        pred["pred_gaze"] = pred[f"iter_{self.num_iter - 1}"]["pred_gaze_0"]

        out = dict(data)
        out.update(pred)
        return out
