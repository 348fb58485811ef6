"""Shared helpers for the repo-root driver entry points (``bench.py`` and
``__graft_entry__.py``).

Both entries need the same three things — honoring the driver's
``JAX_PLATFORMS=cpu`` virtual-device mode, the persistent-compile-cache
policy, and identical synthetic two-view batches — and keeping two copies
already caused drift once (the CPU-cache guard landed in one entry only,
r4 review batch 5).
"""

from __future__ import annotations

import os
from typing import Any, Dict


def honor_cpu_platform_env() -> None:
    """Honor an explicit ``JAX_PLATFORMS=cpu`` (the driver's virtual-device
    mode) even though the session sitecustomize force-selects the TPU
    platform via ``jax.config.update`` — the env var alone cannot win
    against that. Must run before any backend initializes."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
            # Program-order thunk execution on CPU meshes: the
            # concurrency-optimized scheduler lets device threads reach
            # independent collectives in different orders, which deadlocks
            # the rendezvous under mixed subgroup/global collectives (2-D
            # spatial meshes; see tests/conftest.py). Real TPUs get a
            # total order from their static schedule — CPU only.
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_cpu_enable_concurrency_optimized_scheduler"
                "=false"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")


def enable_compile_cache_unless_cpu() -> None:
    """Persistent compile cache on real chips only.

    On TPU it pays for itself immediately (tunnel compiles of the train
    step take minutes). On the CPU virtual mesh it is a MEASURED NEGATIVE
    (r4): warm runs reload XLA:CPU AOT results built with mismatched
    machine features (SIGILL-risk warnings) and ran SLOWER than cold
    (7m17s vs 6m14s on the r50-small dryrun) — so skip it there.
    """
    import jax

    if jax.default_backend() != "cpu":
        from rot_mvgaze_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()


def make_host_batch(rng, batch: int, size: int) -> Dict[str, Any]:
    """Synthetic host-side two-view training batch (uint8 pixels + labels),
    the input contract of ``make_train_step``'s augmentation front."""
    import numpy as np

    return {
        "img_0": rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8),
        "img_1": rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8),
        "gt_gaze": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "gt_gaze_1": rng.uniform(-1, 1, (batch, 2)).astype(np.float32),
        "head_pose_0": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
        "head_pose_1": rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32),
    }


def make_multiview_host_batch(
    rng, batch: int, size: int, num_views: int
) -> Dict[str, Any]:
    """Synthetic host-side V-view training batch (stacked uint8 pixels +
    labels), the input contract of ``make_multiview_train_step``."""
    import numpy as np

    V = num_views
    return {
        "imgs": rng.integers(
            0, 256, (batch, V, size, size, 3), dtype=np.uint8
        ),
        "gt_gazes": rng.uniform(-1, 1, (batch, V, 2)).astype(np.float32),
        "head_poses": rng.uniform(-0.8, 0.8, (batch, V, 2)).astype(
            np.float32
        ),
    }


def make_multiview_init_data(
    size: int, num_views: int, batch: int = 2
) -> Dict[str, Any]:
    """Tiny already-preprocessed V-view batch for ``model.init``."""
    import jax.numpy as jnp

    return {
        "imgs": jnp.zeros((batch, num_views, size, size, 3), jnp.float32),
        "rots": jnp.broadcast_to(jnp.eye(3), (batch, num_views, 3, 3)),
    }


def make_init_data(size: int, batch: int = 2) -> Dict[str, Any]:
    """Tiny already-preprocessed batch for ``model.init`` (shape-only)."""
    import jax.numpy as jnp

    return {
        "img_0": jnp.zeros((batch, size, size, 3), jnp.float32),
        "img_1": jnp.zeros((batch, size, size, 3), jnp.float32),
        "rot_0": jnp.broadcast_to(jnp.eye(3), (batch, 3, 3)),
        "rot_1": jnp.broadcast_to(jnp.eye(3), (batch, 3, 3)),
    }


class Workload:
    """Model + loss + step factories + synthetic-data builders for the
    stereo (V=2) or V-view (V>2) training workload — the ONE owner of the
    multiview-vs-stereo wiring (bench.py, scripts/bench_eval.py and
    ``__graft_entry__.py`` each used to carry their own copy of these
    if/else blocks; review batch r5 flagged the drift risk the r4
    docstring above already names)."""

    def __init__(self, num_views: int = 2, backbone_depth: Any = 50,
                 num_iter: int = 3, dtype: Any = None, remat: bool = False,
                 int8_backbone: Any = False, **stereo_kwargs: Any) -> None:
        import jax.numpy as jnp

        from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss

        if num_views < 2:
            raise ValueError(
                f"num_views must be >= 2 (got {num_views}); the model is "
                "defined over at least one view pair"
            )
        self.num_views = num_views
        self.multiview = num_views > 2
        dtype = jnp.float32 if dtype is None else dtype
        common = dict(backbone_depth=backbone_depth, num_iter=num_iter,
                      dtype=dtype, remat=remat, int8_backbone=int8_backbone)
        if self.multiview:
            if stereo_kwargs:
                # FeatRotationMultiView has no Pallas-fusion/Pallas-BN/
                # ghost-stat/fuse_views fields — constructing "with" them
                # would attribute results to a path that does not exist
                raise ValueError(
                    f"stereo-only model options at num_views={num_views}: "
                    f"{sorted(stereo_kwargs)}"
                )
            from rot_mvgaze_tpu.losses.multiview import MultiViewL1Loss
            from rot_mvgaze_tpu.models.multiview import FeatRotationMultiView

            self.model = FeatRotationMultiView(**common)
            loss = MultiViewL1Loss(rel_weight=0.01, reference_decay=1.0)
        else:
            from rot_mvgaze_tpu.models import FeatRotationSymm

            self.model = FeatRotationSymm(**common, **stereo_kwargs)
            loss = StereoL1Loss(rel_weight=0.01, reference_decay=1.0)
        self.metrics = IterationLoss(loss=loss, iter_decay=0.5)

    # -- step factories (forward extra kwargs, e.g. image_sharding,
    #    fold_key_by_step, freeze_bn; each factory validates its own) --
    def make_train_step(self, tx: Any, image_size: int, **kw: Any):
        if self.multiview:
            from rot_mvgaze_tpu.train.multiview_steps import (
                make_multiview_train_step,
            )

            return make_multiview_train_step(
                self.model, self.metrics, tx, image_size=image_size, **kw
            )
        from rot_mvgaze_tpu.train.steps import make_train_step

        return make_train_step(
            self.model, self.metrics, tx, image_size=image_size, **kw
        )

    def make_eval_step(self, image_size: int, **kw: Any):
        if self.multiview:
            from rot_mvgaze_tpu.train.multiview_steps import (
                make_multiview_eval_step,
            )

            return make_multiview_eval_step(
                self.model, image_size=image_size, **kw
            )
        from rot_mvgaze_tpu.train.steps import make_eval_step

        return make_eval_step(self.model, image_size=image_size, **kw)

    # -- synthetic data --
    def host_batch(self, rng, batch: int, size: int) -> Dict[str, Any]:
        if self.multiview:
            return make_multiview_host_batch(rng, batch, size,
                                             self.num_views)
        return make_host_batch(rng, batch, size)

    def init_data(self, size: int, batch: int = 2) -> Dict[str, Any]:
        if self.multiview:
            return make_multiview_init_data(size, self.num_views, batch)
        return make_init_data(size, batch)

    def images_per_sample(self) -> int:
        return self.num_views
