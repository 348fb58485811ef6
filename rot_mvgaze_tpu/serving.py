"""Batch inference / serving API.

The reference has no serving surface (eval only through the trainer loop,
/root/reference/trainer.py:164-199). For production deployment this module
provides a compiled, fixed-shape predictor:

- loads either native msgpack checkpoints or reference ``.pth.tar`` ones;
- jits the eval pipeline (uint8 -> normalize -> forward) ONCE at a fixed
  micro-batch size and serves arbitrary request sizes by slicing/padding —
  static shapes mean a single cached executable, no recompiles in prod;
- bfloat16 compute by default; pitchyaw outputs in float32;
- optional data-parallel serving over a ``jax.sharding.Mesh``: the
  micro-batch shards across chips (params replicated), scaling serving
  throughput linearly over ICI.

Two predictor classes share the machinery (micro-batching, mesh placement,
int8 calibration, warmup): :class:`GazePredictor` serves the reference's
two-view ``FeatRotationSymm`` (all ablation paths), and
:class:`MultiViewGazePredictor` serves the V-view generalization
(``models.multiview.FeatRotationMultiView``) on stacked ``(N, V, H, W, 3)``
requests — any stereo checkpoint loads at any V (the param trees are
identical by construction).
"""

from __future__ import annotations

import os
import threading
import time
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rot_mvgaze_tpu.augment.ops import eval_preprocess
from rot_mvgaze_tpu.geometry import rotation_matrix_2d
from rot_mvgaze_tpu.models import FeatRotationSymm

# below this many samples, static-int8 auto-calibration warns that its frozen
# activation ranges come from too small a probe (ADVICE r2)
_MIN_CALIBRATION_SAMPLES = 64


MODEL_CONFIG_KEYS = (
    "backbone_depth",
    "num_iter",
    "share_weights",
    "encode_rotmat",
    "share_feature",
    "ignore_rotmat",
)


def _validate_views(
    img_0: np.ndarray,
    img_1: np.ndarray,
    head_pose_0: np.ndarray,
    head_pose_1: np.ndarray,
    image_size: "int | None" = None,
) -> int:
    """Validate a two-view request; returns the batch size N.

    The compiled pipeline divides pixels by 255 on device, so float inputs
    (ToTensor-style, already in [0,1]) would be normalized twice and produce
    silently wrong predictions — reject anything but uint8. Batch dims must
    agree across all four fields (padding a short head-pose array would
    silently fabricate poses). When ``image_size`` is given, H and W must
    match it exactly (fixed-shape serving executable).
    """
    imgs = (("img_0", img_0), ("img_1", img_1))
    n = int(np.shape(img_0)[0]) if np.ndim(img_0) >= 1 else -1
    for name, a in imgs:
        a = np.asarray(a)
        if a.ndim != 4 or a.shape[-1] != 3:
            raise ValueError(
                f"{name} must be (N, H, W, 3) uint8, got {a.shape}"
            )
        if a.dtype != np.uint8:
            raise ValueError(
                f"{name} must be uint8 (raw pixels; normalization runs on "
                f"device — float input would be /255'd a second time), got "
                f"{a.dtype}"
            )
        if a.shape[0] != n:
            raise ValueError("all fields must share the batch dimension")
        if image_size is not None and a.shape[1:3] != (
            image_size,
            image_size,
        ):
            raise ValueError(
                f"{name} must be (N, {image_size}, {image_size}, 3) — the "
                f"server compiles one fixed-shape executable; got "
                f"{a.shape}. Resize client-side or run a server at this "
                f"resolution."
            )
    for name, a in (("head_pose_0", head_pose_0), ("head_pose_1", head_pose_1)):
        if np.shape(a) != (n, 2):
            raise ValueError(f"{name} must be ({n}, 2), got {np.shape(a)}")
    return n


def _validate_stacked_views(
    imgs: np.ndarray,
    head_poses: np.ndarray,
    num_views: int,
    image_size: "int | None" = None,
) -> int:
    """Validate a stacked V-view request; returns the batch size N.

    Same contract as :func:`_validate_views` (uint8-only pixels, agreeing
    batch dims, optional exact resolution) over the stacked layout the
    V-view model consumes: ``imgs (N, V, H, W, 3) uint8`` +
    ``head_poses (N, V, 2)``. V is part of the compiled executable's shape,
    so a request at the wrong view count is a client error, not a reshape.
    """
    a = np.asarray(imgs)
    if a.ndim != 5 or a.shape[-1] != 3:
        raise ValueError(
            f"imgs must be (N, {num_views}, H, W, 3) uint8, got {a.shape}"
        )
    if a.shape[1] != num_views:
        raise ValueError(
            f"this server runs a {num_views}-view model; imgs has "
            f"{a.shape[1]} views (shape {a.shape})"
        )
    if a.dtype != np.uint8:
        raise ValueError(
            f"imgs must be uint8 (raw pixels; normalization runs on device — "
            f"float input would be /255'd a second time), got {a.dtype}"
        )
    n = int(a.shape[0])
    if image_size is not None and a.shape[2:4] != (image_size, image_size):
        raise ValueError(
            f"imgs must be (N, {num_views}, {image_size}, {image_size}, 3) — "
            f"the server compiles one fixed-shape executable; got {a.shape}. "
            f"Resize client-side or run a server at this resolution."
        )
    if np.shape(head_poses) != (n, num_views, 2):
        raise ValueError(
            f"head_poses must be ({n}, {num_views}, 2), got "
            f"{np.shape(head_poses)}"
        )
    return n


def load_variables_for_model(path: str, model: Any) -> Dict[str, Any]:
    """Load serving variables from a native msgpack checkpoint or a
    reference ``.pth.tar`` (converted using the model's config)."""
    if path.endswith((".pth", ".pth.tar", ".pt")):
        from rot_mvgaze_tpu.compat import (
            convert_rot_mv_state_dict,
            load_torch_state_dict,
        )

        # FeatRotationMultiView omits the two stereo-only ablation fields
        # (encode_rotmat / share_feature); its param tree is the stereo tree,
        # so conversion runs with those paths off
        cfg = {k: getattr(model, k, False) for k in MODEL_CONFIG_KEYS}
        converted = convert_rot_mv_state_dict(
            load_torch_state_dict(path), **cfg
        )
        return jax.tree.map(jnp.asarray, converted)
    from rot_mvgaze_tpu.train.checkpoints import restore_variables

    return jax.tree.map(jnp.asarray, restore_variables(path, {}))


def make_serving_forward(
    model: Any, image_size: int = 224, image_sharding: Any = None
):
    """Pure serving forward: ``(variables, img_0, img_1, head_pose_0,
    head_pose_1) -> (N, 2) float32 pitchyaw``.

    Shared by the live :class:`GazePredictor` and the AOT exporter
    (rot_mvgaze_tpu.export) so the deployed artifact is bit-identical to
    the in-process server. ``image_sharding`` re-pins the preprocessed
    views to the H-sharded layout on a 2-D ``(data, spatial)`` mesh (see
    ``train.steps.make_train_step`` — without the constraint GSPMD may
    replicate the spatial axis through the resize)."""

    def forward(variables, img_0, img_1, head_pose_0, head_pose_1):
        from rot_mvgaze_tpu.parallel.mesh import pin_images

        data = pin_images(
            {
                "img_0": eval_preprocess(img_0, image_size),
                "img_1": eval_preprocess(img_1, image_size),
            },
            image_sharding,
        )
        data["rot_0"] = rotation_matrix_2d(head_pose_0)
        data["rot_1"] = rotation_matrix_2d(head_pose_1)
        out = model.apply(variables, data, train=False)
        return out["pred_gaze"].astype(jnp.float32)

    return forward


def make_calibration_forward(
    model: Any, image_size: int = 224, image_sharding: Any = None
):
    """Calibration twin of :func:`make_serving_forward` for the static-int8
    path: runs with the ``quant`` collection mutable so every QuantConv
    records its activation range (quantizing dynamically meanwhile, so the
    returned predictions are valid). Returns ``(pred, updated_quant)``.
    ``image_sharding`` must match the serving forward's — the recorded
    activation ranges must come from the SAME partitioning the frozen
    executable serves (and an unconstrained calibration graph on a spatial
    mesh would replicate full-height activations per chip, defeating the
    memory reason spatial serving exists)."""

    def forward(variables, img_0, img_1, head_pose_0, head_pose_1):
        from rot_mvgaze_tpu.parallel.mesh import pin_images

        data = pin_images(
            {
                "img_0": eval_preprocess(img_0, image_size),
                "img_1": eval_preprocess(img_1, image_size),
            },
            image_sharding,
        )
        data["rot_0"] = rotation_matrix_2d(head_pose_0)
        data["rot_1"] = rotation_matrix_2d(head_pose_1)
        out, updates = model.apply(
            variables, data, train=False, mutable=["quant"]
        )
        return out["pred_gaze"].astype(jnp.float32), updates["quant"]

    return forward


def _multiview_data(imgs, head_poses, image_size: int):
    """Shared preprocessing for the V-view serving/calibration forwards:
    stacked uint8 views -> normalized float views + SO(3) rotations.

    All ``N*V`` images preprocess as ONE batch (the eval path is per-row
    deterministic, so row order is irrelevant), mirroring the V-view train
    step (train.multiview_steps); ``rotation_matrix_2d`` is trailing-axis,
    so the view axis rides along."""
    B, V = imgs.shape[0], imgs.shape[1]
    flat = imgs.reshape((B * V,) + imgs.shape[2:])
    proc = eval_preprocess(flat, image_size)
    return {
        "imgs": proc.reshape((B, V) + proc.shape[1:]),
        "rots": rotation_matrix_2d(head_poses.astype(jnp.float32)),
    }


def make_multiview_serving_forward(model: Any, image_size: int = 224):
    """Pure V-view serving forward: ``(variables, imgs (N,V,H,W,3) uint8,
    head_poses (N,V,2)) -> (N, 2) float32 pitchyaw`` (the reference metric's
    view-0 head of the last iteration). Shared by the live
    :class:`MultiViewGazePredictor` and the AOT exporter."""

    def forward(variables, imgs, head_poses):
        data = _multiview_data(imgs, head_poses, image_size)
        out = model.apply(variables, data, train=False)
        return out["pred_gaze"].astype(jnp.float32)

    return forward


def make_multiview_calibration_forward(model: Any, image_size: int = 224):
    """Calibration twin of :func:`make_multiview_serving_forward` (see
    :func:`make_calibration_forward` for the static-int8 contract)."""

    def forward(variables, imgs, head_poses):
        data = _multiview_data(imgs, head_poses, image_size)
        out, updates = model.apply(
            variables, data, train=False, mutable=["quant"]
        )
        return out["pred_gaze"].astype(jnp.float32), updates["quant"]

    return forward


class GazePredictor:
    """Compiled two-view gaze predictor over a FeatRotationSymm checkpoint.

    The per-model pieces (model construction, serving/calibration forwards,
    request validation, init/noise inputs) are overridable hooks so the
    V-view :class:`MultiViewGazePredictor` reuses the full serving machinery
    (micro-batching, mesh placement, static-int8 calibration, warmup).
    """

    #: request field names, in ``predict``'s positional order (the HTTP
    #: server and BatchingPredictor address requests by these)
    request_fields = ("img_0", "img_1", "head_pose_0", "head_pose_1")

    def __init__(
        self,
        checkpoint: str,
        backbone_depth: int = 50,
        num_iter: int = 3,
        share_weights: bool = False,
        encode_rotmat: bool = False,
        share_feature: bool = False,
        ignore_rotmat: bool = False,
        micro_batch: int = 64,
        image_size: int = 224,
        dtype: Any = jnp.bfloat16,
        use_pallas_fusion: bool = False,
        int8: bool = False,
        calibration_path: "str | None" = None,
        mesh: Any = None,
    ) -> None:
        self.model = FeatRotationSymm(
            backbone_depth=backbone_depth,
            num_iter=num_iter,
            share_weights=share_weights,
            encode_rotmat=encode_rotmat,
            share_feature=share_feature,
            ignore_rotmat=ignore_rotmat,
            dtype=dtype,
            use_pallas_fusion=use_pallas_fusion,
            int8_backbone=int8,
        )
        self._init_serving(
            checkpoint, micro_batch, image_size, int8, calibration_path, mesh
        )

    # -------------------------------------------------- per-model hooks
    def _apply_mesh_model(self, mesh: Any, image_size: int) -> Any:
        """Adapt ``self.model`` to the mesh; returns the in-graph image
        sharding constraint (spatial meshes only) or None."""
        from rot_mvgaze_tpu.parallel.mesh import (
            image_sharding,
            spatial_size,
            with_spatial_floor,
        )

        sp = spatial_size(mesh)
        if sp > 1 and image_size % sp:
            # uneven height shards start at the STEM and reach the
            # <2-valid-row regime the floor exists to forbid — reject
            # here (the public constructor), not just in scripts/serve
            raise ValueError(
                f"image_size {image_size} is not divisible by the "
                f"mesh's spatial axis ({sp}); pick an even split"
            )
        # backbone gathers the height axis once feature maps get too
        # small to shard (models/resnet.py spatial_unshard)
        self.model = with_spatial_floor(self.model, mesh)
        return image_sharding(mesh) if sp > 1 else None

    def _make_forward(self, constraint: Any):
        return make_serving_forward(
            self.model, self.image_size, image_sharding=constraint
        )

    def _make_calibration(self, constraint: Any):
        return make_calibration_forward(
            self.model, self.image_size, image_sharding=constraint
        )

    def _init_data(self) -> Dict[str, Any]:
        """Minimal model-input dict for shape inference (``eval_shape``)."""
        s = self.image_size
        return {
            "img_0": jnp.zeros((1, s, s, 3)),
            "img_1": jnp.zeros((1, s, s, 3)),
            "rot_0": jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
            "rot_1": jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
        }

    def _noise_request(self) -> Tuple[np.ndarray, ...]:
        """One throwaway request (n=1) for :meth:`warmup`."""
        rng = np.random.default_rng(0)
        s = self.image_size
        return (
            rng.integers(0, 256, (1, s, s, 3), dtype=np.uint8),
            rng.integers(0, 256, (1, s, s, 3), dtype=np.uint8),
            np.zeros((1, 2), np.float32),
            np.zeros((1, 2), np.float32),
        )

    def validate_request(
        self, *args: np.ndarray, image_size: "int | None" = None
    ) -> int:
        """Validate a request tuple (``request_fields`` order); returns N."""
        return _validate_views(*args, image_size=image_size)

    # -------------------------------------------------- shared machinery
    def _init_serving(
        self,
        checkpoint: str,
        micro_batch: int,
        image_size: int,
        int8: Any,
        calibration_path: "str | None",
        mesh: Any,
    ) -> None:
        self.mesh = mesh
        self.image_size = image_size
        self._batch_sharding = None
        self._image_sharding = None
        _constraint = None  # in-graph re-pin, spatial meshes only
        if mesh is not None:
            from rot_mvgaze_tpu.parallel.mesh import (
                batch_sharding,
                dp_size,
                image_sharding,
            )

            _constraint = self._apply_mesh_model(mesh, image_size)
            # round the executable's batch up to a DATA-axis multiple (a
            # 2-D mesh's 'spatial' axis shards height, not rows — spatial
            # partitioning exists exactly so one request can use N chips)
            n_dev = dp_size(mesh)
            micro_batch = -(-micro_batch // n_dev) * n_dev
            self._batch_sharding = batch_sharding(mesh)
            # rank>=4 image args additionally shard height over 'spatial'
            # on a 2-D mesh (GSPMD conv halo exchange); on a 1-D mesh this
            # equals batch_sharding, so it is rank-agnostic
            self._image_sharding = image_sharding(mesh)
        self.micro_batch = micro_batch
        self.variables = self._load(checkpoint)
        # static-int8: materialize a zeroed `quant` collection (activation
        # ranges); filled by calibrate() / auto-calibration on the first
        # request. Checkpoints never carry it — it is serving-side state.
        self._int8_static = int8 == "static"
        if calibration_path is not None and not self._int8_static:
            # only the static path ever reads or writes it; accepting it
            # elsewhere would let a user believe ranges are persisted
            raise ValueError(
                "calibration_path requires int8='static' (dynamic int8 and "
                "bf16 serving have no persistent activation ranges)"
            )
        self._calibrated = False
        # calibration mutates self.variables; concurrent first requests must
        # not interleave the read-modify-write (BatchingPredictor serializes
        # anyway; this guards direct multi-threaded GazePredictor use)
        self._calib_lock = threading.Lock()
        if self._int8_static:
            dummy = self._init_data()
            shapes = jax.eval_shape(
                lambda: self.model.init(
                    {"params": jax.random.PRNGKey(0)}, dummy
                )
            )
            self.variables = {
                **self.variables,
                "quant": jax.tree.map(
                    lambda a: jnp.zeros(a.shape, a.dtype), shapes["quant"]
                ),
            }
            self._calib = jax.jit(self._make_calibration(_constraint))
            # Persistable calibration: load previously saved activation
            # ranges if the file exists; otherwise auto-save there once the
            # first calibration completes (a restarted server then skips
            # the calibration pass entirely).
            self._calibration_path = calibration_path
            if calibration_path is not None and os.path.exists(
                calibration_path
            ):
                self.load_calibration(calibration_path)
        if mesh is not None:
            from rot_mvgaze_tpu.parallel.mesh import replicated_sharding

            # after the quant collection (if any) exists: params + ranges
            # replicate together
            self.variables = jax.device_put(
                self.variables, replicated_sharding(mesh)
            )
        self._forward = jax.jit(self._make_forward(_constraint))

    def _load(self, path: str) -> Dict[str, Any]:
        return load_variables_for_model(path, self.model)

    def predict(
        self,
        img_0: np.ndarray,
        img_1: np.ndarray,
        head_pose_0: np.ndarray,
        head_pose_1: np.ndarray,
    ) -> np.ndarray:
        """(N,H,W,3) uint8 x2 views + (N,2) head poses -> (N,2) pitchyaw.

        Any N: requests are served in fixed micro-batches (last one padded),
        so only one executable is ever compiled. Images at a resolution
        other than ``image_size`` are accepted (resized on device) but each
        distinct resolution compiles its own executable.
        """
        n = self.validate_request(img_0, img_1, head_pose_0, head_pose_1)
        return self._predict_request(
            (img_0, img_1, head_pose_0, head_pose_1), n
        )

    def _predict_request(
        self, args: Tuple[np.ndarray, ...], n: int
    ) -> np.ndarray:
        """Shared post-validation predict path (auto-calibration aware)."""
        if n == 0:
            return np.zeros((0, 2), np.float32)
        ran_calib = self._int8_static and not self._calibrated
        if ran_calib and n < _MIN_CALIBRATION_SAMPLES:
            import warnings

            warnings.warn(
                f"static-int8 auto-calibration is freezing activation ranges "
                f"from only {n} sample(s); later out-of-range activations "
                f"will be silently clipped. Call calibrate() with >= "
                f"{_MIN_CALIBRATION_SAMPLES} representative samples for "
                f"stable scales.",
                stacklevel=2,
            )
        out = self._predict(*args, force_calib=ran_calib)
        # persist REAL-data calibration only (warmup noise calibration goes
        # through _predict directly and is never saved)
        if ran_calib and getattr(self, "_calibration_path", None) is not None:
            self.save_calibration(self._calibration_path)
        return out

    def _predict(
        self, *request: np.ndarray, force_calib: bool = False
    ) -> np.ndarray:
        from rot_mvgaze_tpu.utils.padding import iter_padded_microbatches

        if int(np.shape(request[0])[0]) == 0:
            # zero micro-batches would run: never mark the predictor
            # calibrated off an empty pass (all-zero frozen scales)
            return np.zeros((0, 2), np.float32)
        use_calib = force_calib
        outs = []
        for padded, bs in iter_padded_microbatches(
            tuple(request), self.micro_batch
        ):
            # pixels stay uint8 (normalized on device); every other field
            # (head poses) is float32 in the compiled signature. Keyed on
            # RANK (images are the rank>=4 fields), not dtype: a uint8 pose
            # array must still be cast — unsigned arithmetic would wrap its
            # negated pitch inside the traced forward, and the odd dtype
            # would compile a second executable.
            args = tuple(
                a if np.asarray(a).ndim >= 4
                else np.asarray(a, np.float32)
                for a in padded
            )
            if self._batch_sharding is not None:
                args = tuple(
                    jax.device_put(
                        a,
                        self._image_sharding
                        if getattr(a, "ndim", 0) >= 4
                        else self._batch_sharding,
                    )
                    for a in args
                )
            if use_calib:
                with self._calib_lock:
                    pred, quant = self._calib(self.variables, *args)
                    self.variables = {**self.variables, "quant": quant}
            else:
                pred = self._forward(self.variables, *args)
            outs.append(np.asarray(pred)[:bs])
        if use_calib:
            with self._calib_lock:
                self._calibrated = True
        return np.concatenate(outs, axis=0)

    def calibrate(
        self,
        img_0: np.ndarray,
        img_1: np.ndarray,
        head_pose_0: np.ndarray,
        head_pose_1: np.ndarray,
    ) -> np.ndarray:
        """static-int8: record activation ranges from representative data
        (running max — repeated calls extend coverage). Called implicitly on
        the first ``predict`` if never calibrated; call explicitly with a
        broad sample for better clipping behavior. Always runs the
        calibration pass for ITS data regardless of concurrent predicts.
        Returns the (dynamically quantized, valid) predictions for the
        calibration data."""
        return self._calibrate_request(
            (img_0, img_1, head_pose_0, head_pose_1)
        )

    def _calibrate_request(self, args: Tuple[np.ndarray, ...]) -> np.ndarray:
        if not self._int8_static:
            raise RuntimeError("calibrate() requires int8='static'")
        n = self.validate_request(*args)
        if n == 0:
            # zero samples record zero ranges; silently marking the
            # predictor calibrated would freeze all-zero scales for the
            # life of the process
            raise ValueError(
                "calibrate() needs at least 1 sample (got an empty batch)"
            )
        out = self._predict(*args, force_calib=True)
        if getattr(self, "_calibration_path", None) is not None:
            self.save_calibration(self._calibration_path)
        return out

    def warmup(self) -> None:
        """Compile every executable this predictor will use, with throwaway
        noise inputs, WITHOUT polluting calibration state.

        bf16/dynamic-int8: compiles the single serving executable.
        static-int8: compiles the calibration pass AND the frozen
        static-scale executable, then discards the noise-derived activation
        ranges (they are a running max — they would otherwise inflate the
        scales for the life of the process). The first real request (or an
        explicit :meth:`calibrate`) then calibrates from scratch.
        """
        noise = self._noise_request()
        if self._int8_static and not self._calibrated:
            self._predict(*noise, force_calib=True)   # calibration graph
            self._predict(*noise, force_calib=False)  # frozen graph
            self.reset_calibration()
        else:
            # already calibrated (e.g. ranges loaded from calibration_path):
            # compile the frozen executable only, ranges untouched
            self.predict(*noise)

    def save_calibration(self, path: str) -> str:
        """static-int8: persist the recorded activation ranges (msgpack) so
        a restarted server can skip calibration (``calibration_path=``)."""
        if not self._int8_static:
            raise RuntimeError("save_calibration() requires int8='static'")
        from rot_mvgaze_tpu.train.checkpoints import save_state

        return save_state(path, {"quant": self.variables["quant"]})

    def load_calibration(self, path: str) -> None:
        """static-int8: restore activation ranges saved by
        :meth:`save_calibration`; the predictor starts frozen (no
        calibration pass on the first request)."""
        if not self._int8_static:
            raise RuntimeError("load_calibration() requires int8='static'")
        from rot_mvgaze_tpu.train.checkpoints import restore_tree

        tree = restore_tree(path)
        if "quant" not in tree:
            raise ValueError(f"{path} is not a calibration file (no 'quant')")
        quant = jax.tree.map(jnp.asarray, tree["quant"])
        if jax.tree.structure(quant) != jax.tree.structure(
            self.variables["quant"]
        ):
            raise ValueError(
                f"calibration at {path} does not match this architecture"
            )
        with self._calib_lock:
            self.variables = {**self.variables, "quant": quant}
            self._calibrated = True

    def reset_calibration(self) -> None:
        """static-int8: zero the recorded activation ranges (e.g. after a
        warmup on non-representative data) so the next request — or an
        explicit :meth:`calibrate` — re-records them from scratch."""
        if not self._int8_static:
            return
        with self._calib_lock:
            self.variables = {
                **self.variables,
                "quant": jax.tree.map(
                    lambda a: jnp.zeros_like(a), self.variables["quant"]
                ),
            }
            self._calibrated = False


class MultiViewGazePredictor(GazePredictor):
    """Compiled V-view gaze predictor (``models.multiview``).

    Requests are stacked: ``imgs (N, V, H, W, 3) uint8`` +
    ``head_poses (N, V, 2)`` -> ``(N, 2)`` float32 pitchyaw (the reference
    metric's view-0 head of the last iteration). V is static (part of the
    compiled executable). Any stereo checkpoint — native msgpack or a
    converted reference ``.pth.tar`` — loads at any V: the V-view param tree
    is the stereo tree by construction (models/multiview.py).

    Supports the same serving machinery as :class:`GazePredictor`:
    micro-batching with padding, data-parallel meshes, bf16/f32/int8
    (dynamic and calibrated-static). Spatial meshes are rejected — the
    V-view path is DP-only, matching the training CLI
    (rot_mvgaze_tpu/cli/main.py ``--num_views`` support matrix). The
    ``encode_rotmat``/``share_feature`` ablations have no V-view counterpart
    and are refused by the model itself.
    """

    request_fields = ("imgs", "head_poses")

    def __init__(
        self,
        checkpoint: str,
        num_views: int,
        backbone_depth: int = 50,
        num_iter: int = 3,
        share_weights: bool = False,
        ignore_rotmat: bool = False,
        micro_batch: int = 64,
        image_size: int = 224,
        dtype: Any = jnp.bfloat16,
        int8: bool = False,
        calibration_path: "str | None" = None,
        mesh: Any = None,
    ) -> None:
        from rot_mvgaze_tpu.models.multiview import FeatRotationMultiView

        if num_views < 2:
            raise ValueError(f"num_views must be >= 2, got {num_views}")
        self.num_views = num_views
        self.model = FeatRotationMultiView(
            backbone_depth=backbone_depth,
            num_iter=num_iter,
            share_weights=share_weights,
            ignore_rotmat=ignore_rotmat,
            dtype=dtype,
            int8_backbone=int8,
        )
        self._init_serving(
            checkpoint, micro_batch, image_size, int8, calibration_path, mesh
        )

    # -------------------------------------------------- per-model hooks
    def _apply_mesh_model(self, mesh: Any, image_size: int) -> Any:
        from rot_mvgaze_tpu.parallel.mesh import spatial_size

        if spatial_size(mesh) > 1:
            raise ValueError(
                "MultiViewGazePredictor does not support spatial meshes "
                "(the V-view path is DP-only, matching the training CLI); "
                "use a 1-D data mesh"
            )
        return None

    def _make_forward(self, constraint: Any):
        return make_multiview_serving_forward(self.model, self.image_size)

    def _make_calibration(self, constraint: Any):
        return make_multiview_calibration_forward(self.model, self.image_size)

    def _init_data(self) -> Dict[str, Any]:
        s, v = self.image_size, self.num_views
        return {
            "imgs": jnp.zeros((1, v, s, s, 3)),
            "rots": jnp.broadcast_to(jnp.eye(3), (1, v, 3, 3)),
        }

    def _noise_request(self) -> Tuple[np.ndarray, ...]:
        rng = np.random.default_rng(0)
        s, v = self.image_size, self.num_views
        return (
            rng.integers(0, 256, (1, v, s, s, 3), dtype=np.uint8),
            np.zeros((1, v, 2), np.float32),
        )

    def validate_request(
        self, *args: np.ndarray, image_size: "int | None" = None
    ) -> int:
        return _validate_stacked_views(
            *args, num_views=self.num_views, image_size=image_size
        )

    # -------------------------------------------------- public API
    def predict(
        self, imgs: np.ndarray, head_poses: np.ndarray
    ) -> np.ndarray:
        """(N,V,H,W,3) uint8 + (N,V,2) head poses -> (N,2) pitchyaw.

        Any N: requests are served in fixed micro-batches (last one padded),
        so only one executable is ever compiled. Images at a resolution
        other than ``image_size`` are accepted (resized on device) but each
        distinct resolution compiles its own executable.
        """
        n = self.validate_request(imgs, head_poses)
        return self._predict_request((imgs, head_poses), n)

    def calibrate(
        self, imgs: np.ndarray, head_poses: np.ndarray
    ) -> np.ndarray:
        """static-int8 calibration on stacked V-view data; see
        :meth:`GazePredictor.calibrate` for the contract."""
        return self._calibrate_request((imgs, head_poses))


class BatchingPredictor:
    """Dynamic request coalescing in front of a :class:`GazePredictor`.

    Concurrent callers' samples are merged into shared micro-batches by a
    single dispatcher thread: under load the executable runs FULL batches
    instead of one padded batch per request (the padding is wasted compute),
    and callers block only until their own rows are ready. The reference has
    no serving tier at all; this is the standard production pattern for a
    fixed-shape compiled model server.

    - ``max_delay_ms``: how long the dispatcher waits to fill a batch before
      flushing a partial one (latency bound under low load).
    - Thread-safe; any number of caller threads.

    Works in front of any predictor exposing the ``request_fields`` /
    ``validate_request`` protocol (both :class:`GazePredictor` and
    :class:`MultiViewGazePredictor`); ``predict`` takes positional arrays
    in ``request_fields`` order, all concatenating on the batch axis.
    """

    def __init__(self, predictor: GazePredictor, max_delay_ms: float = 2.0):
        self.predictor = predictor
        self.request_fields = predictor.request_fields
        self.max_delay = max_delay_ms / 1e3
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._queue: List[Tuple[tuple, "threading.Event", dict, int]] = []
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def predict(self, *args: np.ndarray) -> np.ndarray:
        if len(args) != len(self.request_fields):
            raise ValueError(
                f"predict takes {len(self.request_fields)} arrays "
                f"({', '.join(self.request_fields)}), got {len(args)}"
            )
        # Validate the RAW arrays BEFORE enqueueing (and before any dtype
        # coercion — a rejection must name the dtype the client actually
        # sent, and a large malformed batch must not be copied just to be
        # refused): one malformed request fails in its own calling thread,
        # never poisoning a coalesced batch of strangers. Resolution is
        # pinned to the predictor's image_size here (unlike direct
        # GazePredictor use): an off-size request would recompile a fresh
        # executable INSIDE the single dispatcher thread, stalling every
        # coalesced caller behind it.
        raw = tuple(map(np.asarray, args))
        n = self.predictor.validate_request(
            *raw, image_size=self.predictor.image_size
        )
        # pixels stay uint8 (just validated); every other (rank<4) field is
        # float32 — coalesced batches must share one compiled signature
        req = tuple(
            a if a.ndim >= 4 else np.asarray(a, np.float32) for a in raw
        )
        if n == 0:
            return np.zeros((0, 2), np.float32)
        done = threading.Event()
        out: dict = {}
        with self._cv:
            if self._closed:
                raise RuntimeError("BatchingPredictor is closed")
            self._queue.append((req, done, out, n))
            self._cv.notify()
        done.wait()
        if "error" in out:
            raise out["error"]
        return out["pred"]

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._worker.join(timeout=5)

    # ------------------------------------------------------------------
    def _run(self) -> None:
        mb = self.predictor.micro_batch
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if self._closed and not self._queue:
                    return
                # collect until a full micro-batch is queued or the delay
                # budget is spent
                deadline = time.monotonic() + self.max_delay
                while (
                    sum(r[3] for r in self._queue) < mb and not self._closed
                ):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                # coalesce only shape-compatible requests (EVERY field's
                # trailing dims — a single-view mismatch would poison the
                # shared concatenate): the rest stay queued for the next
                # dispatch round
                def shape_key(r):
                    return tuple(a.shape[1:] for a in r[0])

                key = shape_key(self._queue[0])
                batch = [r for r in self._queue if shape_key(r) == key]
                self._queue = [r for r in self._queue if shape_key(r) != key]
            try:
                pred = self.predictor.predict(
                    *(
                        np.concatenate([r[0][i] for r in batch])
                        for i in range(len(self.request_fields))
                    )
                )
                start = 0
                for _, done, out, n in batch:
                    out["pred"] = pred[start : start + n]
                    start += n
                    done.set()
            except Exception as e:  # propagate to every waiting caller
                for _, done, out, _ in batch:
                    out["error"] = e
                    done.set()
