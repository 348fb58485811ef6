"""N-view generalization of the rotation-constrained fusion model.

The reference model is hard-wired to exactly two views
(/root/reference/models/rot_mv.py:187-266: ``img_0/img_1`` twin plumbing),
while the datasets it trains on capture **18 cameras per frame**
(/root/reference/dataset/gaze.py:62-65) — the pair index throws away 16 of
them. ``FeatRotationMultiView`` extends the paper's fusion rule along its
natural axis: each view's rotatable feature is fused with the **mean of
every other view's feature rotated into its frame**,

    partner_v = mean_{w != v}  (R_v R_w^T) @ f_w          (pre-update f_w)
    f_v'      = fuser_i(img_feat_v, partner_v)
    g_v       = head_i([img_feat_v, f_v'])

which for V=2 degenerates to the reference's exact update (the mean over a
single partner is that partner), so this module **reduces bit-for-bit to
``FeatRotationSymm`` at V=2** and — because every submodule keeps the same
name and shape (``backbone``, ``lifter``, ``img_fuser_{i}``,
``gaze_estimator_{i}``; the mean keeps the fuser input dimension
V-independent) — **any stereo checkpoint, including the released reference
checkpoints after conversion, loads unchanged at any V** (zero-shot V>2
inference, or a warm start for V>2 fine-tuning).

TPU-first layout: views live in a stacked ``(B, V, ...)`` axis (static V),
the backbone consumes all ``B*V`` images as ONE batch (bigger GEMMs — the
multi-view analogue of ``fuse_views``), and the all-pairs rotation
``(B,V,V,3,3)`` is a single einsum. No Python control flow depends on data.

Input  : ``{"imgs": (B,V,H,W,C), "rots": (B,V,3,3), ...}``
Output : input ∪ ``{num_iter, num_views, img_feats (B,V,D),
          initial_rot_feats (B,V,3,K),
          iter_{i}: {feats (B,V,3,K), pred_gazes (B,V,2)},
          pred_gaze (B,2) = last iteration, view 0}`` — the eval metric
stays the reference's (view-0 head of the last iteration,
/root/reference/models/rot_mv.py:265).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rot_mvgaze_tpu.models.blocks import Mlp
from rot_mvgaze_tpu.models.resnet import BACKBONES
from rot_mvgaze_tpu.models.rot_mv import (
    NUM_FEAT_VEC,
    Feat3dLifter,
    ImageFeatFuser,
)


class FeatRotationMultiView(nn.Module):
    """V-view rotation-constrained fusion; see module docstring.

    Supports the default fuser path plus the ``share_weights`` and
    ``ignore_rotmat`` ablations. ``encode_rotmat`` (concatenate the raw
    relative rotation) and ``share_feature`` (pairwise IntensityBatchNorm
    concat) have no V-view counterpart in the paper — with several partners
    there is no single rotation matrix / partner feature to encode — so
    they are refused rather than given invented semantics.
    """

    backbone_depth: Any = 50
    num_iter: int = 3
    share_weights: bool = False
    ignore_rotmat: bool = False
    num_feat_vec: int = NUM_FEAT_VEC
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    # Rematerialize backbone blocks on backward (larger per-chip batches).
    remat: bool = False
    # int8 MXU backbone convs at eval/serving (ops/quant.py).
    int8_backbone: Any = False
    # Spatial-partitioning floor (see models/resnet.py ResNet.spatial_unshard).
    spatial_unshard: Optional[Any] = None

    def setup(self) -> None:
        backbone_ctor = BACKBONES[self.backbone_depth]
        self.backbone = backbone_ctor(
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            bn_axis_name=self.bn_axis_name,
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
        n_distinct = 1 if self.share_weights else self.num_iter
        self.img_fusers = [
            ImageFeatFuser(
                fc_dim,
                self.num_feat_vec,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"img_fuser_{i}",
            )
            for i in range(n_distinct)
        ]
        self.gaze_estimators = [
            Mlp(
                features=[512, 2],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"gaze_estimator_{i}",
            )
            for i in range(n_distinct)
        ]

    def __call__(
        self, data: Dict[str, Any], train: bool = False
    ) -> Dict[str, Any]:
        imgs = data["imgs"]  # (B, V, H, W, C)
        rots = data["rots"].astype(jnp.float32)  # (B, V, 3, 3)
        B, V = imgs.shape[0], imgs.shape[1]
        if V < 2:
            raise ValueError(f"need at least 2 views, got V={V}")
        K = self.num_feat_vec

        # All V*B images through the backbone as ONE batch (row order is
        # irrelevant to the per-row fusers/heads; train-mode BN statistics
        # merge across views — the V-view analogue of fuse_views).
        flat_imgs = imgs.reshape((B * V,) + imgs.shape[2:])
        img_feats_flat = self.backbone(flat_imgs, train)  # (B*V, D)
        rot_feats_flat = self.lifter(img_feats_flat)  # (B*V, 3, K)
        img_feats = img_feats_flat.reshape(B, V, -1)

        # rel[b, v, w] = R_v @ R_w^T: rotation taking view w's rotatable
        # feature into view v's frame (stereo rot_10 == rel[:, 0, 1],
        # /root/reference/models/rot_mv.py:193-194). 3x3 composes in full
        # precision, like the stereo path.
        rel = jnp.einsum(
            "bvij,bwkj->bvwik",
            rots,
            rots,
            precision=jax.lax.Precision.HIGHEST,
        )
        # mean over the OTHER views only: mask the diagonal, divide by V-1
        not_self = (1.0 - jnp.eye(V, dtype=jnp.float32)).reshape(1, V, V, 1, 1)

        pred: Dict[str, Any] = {
            "num_iter": self.num_iter,
            "num_views": V,
            "img_feats": img_feats,
            "initial_rot_feats": rot_feats_flat.reshape(B, V, 3, K),
        }

        feats = rot_feats_flat.reshape(B, V, 3, K)
        for f_i in range(self.num_iter):
            m_i = 0 if self.share_weights else f_i
            if self.ignore_rotmat:
                # un-rotated partners (the "no rotation constraint"
                # ablation, /root/reference/models/rot_mv.py:226-232)
                rotated = jnp.broadcast_to(
                    feats.astype(jnp.float32)[:, None], (B, V, V, 3, K)
                )
            else:
                # rotated[b, v, w] = rel[b, v, w] @ f_w  (pre-update f — the
                # synchronous update of /root/reference/models/rot_mv.py:217)
                rotated = jnp.einsum(
                    "bvwik,bwkn->bvwin",
                    rel,
                    feats.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST,
                )
            partners = (
                jnp.sum(rotated * not_self, axis=2) / (V - 1)
            ).astype(feats.dtype)  # (B, V, 3, K)

            # fusers/heads are per-row MLPs: flatten views into the batch so
            # every call sees the exact 2-D shapes of the stereo path
            new_flat = self.img_fusers[m_i](
                img_feats_flat, partners.reshape(B * V, 3, K), None
            )  # rotation already applied -> rot=None
            feats = new_flat.reshape(B, V, 3, K)
            head_in = jnp.concatenate([img_feats_flat, new_flat], axis=-1)
            gazes = self.gaze_estimators[m_i](head_in).reshape(B, V, 2)

            pred[f"iter_{f_i}"] = {"feats": feats, "pred_gazes": gazes}

        # the reference metric: last iteration, view 0
        pred["pred_gaze"] = pred[f"iter_{self.num_iter - 1}"]["pred_gazes"][
            :, 0
        ]

        out = dict(data)
        out.update(pred)
        return out
