"""AOT model export: serialized StableHLO serving artifacts (jax.export).

The reference deploys by shipping a ``.pth.tar`` plus the full Python model
code (/root/reference/README.md:45-55 — loading requires importing
``models.rot_mv``). Here the serving graph itself is exported ahead of time:

- ``export_serving_artifact`` traces the exact serving forward used by
  :class:`rot_mvgaze_tpu.serving.GazePredictor` (uint8 views -> normalize ->
  twin backbone -> fusion -> float32 pitchyaw) at a fixed micro-batch and
  serializes it with ``jax.export`` — a versioned, self-describing StableHLO
  module with no dependency on the model-definition code at load time.
- ``AotGazePredictor`` serves an artifact + checkpoint pair with the same
  pad-to-micro-batch protocol as the live predictor (single executable,
  any request size).

The weights are passed at call time (not baked into the module), so one
artifact serves every checkpoint of the same architecture, and the artifact
stays small (~KBs of IR, not ~100s of MB of constants).

TPU-native notes: the exported module records the lowering platform(s);
export with ``platforms=("tpu", "cpu")`` to produce one artifact that runs
on a TPU serving fleet and on CPU canaries alike. Compilation happens once
at load, against the local PJRT client.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from rot_mvgaze_tpu.serving import make_serving_forward


def _abstract_batch(
    micro_batch: int, image_size: int, num_views: Optional[int] = None
) -> Tuple[jax.ShapeDtypeStruct, ...]:
    if num_views is not None:
        # stacked V-view request: imgs (B,V,H,W,3) uint8 + poses (B,V,2)
        img = jax.ShapeDtypeStruct(
            (micro_batch, num_views, image_size, image_size, 3), jnp.uint8
        )
        pose = jax.ShapeDtypeStruct(
            (micro_batch, num_views, 2), jnp.float32
        )
        return img, pose
    img = jax.ShapeDtypeStruct(
        (micro_batch, image_size, image_size, 3), jnp.uint8
    )
    pose = jax.ShapeDtypeStruct((micro_batch, 2), jnp.float32)
    return img, img, pose, pose


def export_serving_artifact(
    model: Any,
    variables: Dict[str, Any],
    path: str,
    micro_batch: int = 64,
    image_size: int = 224,
    platforms: Optional[Sequence[str]] = None,
    num_views: Optional[int] = None,
) -> "jax_export.Exported":
    """Trace + serialize the serving forward; returns the Exported object.

    ``variables`` supplies only the pytree STRUCTURE and dtypes (values are
    not baked in); pass the checkpoint you intend to serve or a fresh
    ``model.init`` result of the same architecture.

    A ``FeatRotationMultiView`` model exports the stacked V-view forward
    (``imgs (B,V,H,W,3)`` + ``head_poses (B,V,2)``); ``num_views`` is then
    required — V is part of the artifact's fixed shape.
    """
    if "quant" in variables or getattr(model, "int8_backbone", False) == "static":
        raise ValueError(
            "static-int8 models cannot be exported: the calibrated `quant` "
            "ranges are live-serving state that checkpoint loaders do not "
            "reconstruct. Export the dynamic int8 graph (int8=True) or "
            "bf16/f32 instead."
        )
    from rot_mvgaze_tpu.models.multiview import FeatRotationMultiView

    is_multiview = isinstance(model, FeatRotationMultiView)
    if is_multiview:
        if num_views is None or num_views < 2:
            raise ValueError(
                "exporting a FeatRotationMultiView needs num_views >= 2 "
                "(V is part of the artifact's fixed request shape)"
            )
        from rot_mvgaze_tpu.serving import make_multiview_serving_forward

        fwd = jax.jit(make_multiview_serving_forward(model, image_size))
    elif num_views is not None:
        raise ValueError(
            "num_views applies only to FeatRotationMultiView exports; the "
            "two-view model's request shape is fixed"
        )
    else:
        fwd = jax.jit(make_serving_forward(model, image_size))
    var_avals = jax.tree.map(
        # .dtype/.shape attributes only — no host<->device copies of weights
        lambda x: jax.ShapeDtypeStruct(
            np.shape(x),
            getattr(x, "dtype", None) or np.asarray(x).dtype,
        ),
        variables,
    )
    exported = jax_export.export(fwd, platforms=platforms)(
        var_avals, *_abstract_batch(micro_batch, image_size, num_views)
    )
    blob = exported.serialize()
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    # metadata sidecar: records the architecture so the loader can convert
    # reference .pth.tar checkpoints without being told the config
    import json

    from rot_mvgaze_tpu.serving import MODEL_CONFIG_KEYS

    meta = {
        k: getattr(model, k)
        for k in MODEL_CONFIG_KEYS
        if hasattr(model, k)
    }
    meta.update(micro_batch=micro_batch, image_size=image_size)
    if is_multiview:
        meta["num_views"] = num_views
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return exported


def load_serving_artifact(path: str) -> "jax_export.Exported":
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


class AotGazePredictor:
    """Serves an exported artifact + checkpoint with request padding.

    Mirrors :class:`rot_mvgaze_tpu.serving.GazePredictor.predict`: requests
    of any size are served in the artifact's fixed micro-batches (last one
    padded), so exactly one executable is compiled at load.
    """

    def __init__(self, artifact_path: str, checkpoint: str) -> None:
        self.exported = load_serving_artifact(artifact_path)
        # Trailing request avals: stereo = (img_0, img_1, pose_0, pose_1)
        # with a rank-2 (B, 2) final pose; multiview = (imgs, head_poses)
        # with a rank-3 (B, V, 2) final pose. The rank disambiguates without
        # needing the sidecar.
        pose_aval = self.exported.in_avals[-1]
        self.num_views = None
        if len(pose_aval.shape) == 3:
            self.n_request = 2
            img_aval = self.exported.in_avals[-2]
            self.num_views = int(img_aval.shape[1])
            self.image_size = int(img_aval.shape[2])
        else:
            self.n_request = 4
            img_aval = self.exported.in_avals[-4]
            self.image_size = int(img_aval.shape[1])
        self.micro_batch = int(img_aval.shape[0])
        if checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            # reference checkpoint: the exporter's metadata sidecar carries
            # the architecture needed for conversion
            import json

            from rot_mvgaze_tpu.models import FeatRotationSymm
            from rot_mvgaze_tpu.serving import (
                MODEL_CONFIG_KEYS,
                load_variables_for_model,
            )

            sidecar = artifact_path + ".json"
            if not os.path.exists(sidecar):
                raise FileNotFoundError(
                    f"loading a torch checkpoint needs the {sidecar} "
                    "metadata sidecar written by export_serving_artifact"
                )
            with open(sidecar) as f:
                meta = json.load(f)
            # Multiview artifacts convert through the STEREO model: the
            # V-view param tree is the stereo tree by construction
            # (models/multiview.py), and its sidecar omits the stereo-only
            # ablation keys (-> their False defaults here).
            model = FeatRotationSymm(
                **{k: meta[k] for k in MODEL_CONFIG_KEYS if k in meta}
            )
            self.variables = load_variables_for_model(checkpoint, model)
        else:
            from rot_mvgaze_tpu.train.checkpoints import restore_variables

            self.variables = jax.tree.map(
                jnp.asarray, restore_variables(checkpoint, {})
            )
        # Align checkpoint leaf dtypes with the artifact's traced avals:
        # exported.call validates avals EXACTLY, so e.g. a float32 converted
        # .pth.tar against a bf16-param artifact would fail deep inside
        # jax.export on every predict. Cast here (and fail clearly on a
        # structural mismatch instead).
        leaves, treedef = jax.tree.flatten(self.variables)
        var_avals = self.exported.in_avals[: len(leaves)]
        if len(self.exported.in_avals) != len(leaves) + self.n_request:
            raise ValueError(
                f"artifact expects "
                f"{len(self.exported.in_avals) - self.n_request} "
                f"variable leaves, checkpoint has {len(leaves)} — wrong "
                "checkpoint for this artifact?"
            )
        for i, (leaf, aval) in enumerate(zip(leaves, var_avals)):
            if tuple(leaf.shape) != tuple(aval.shape):
                raise ValueError(
                    f"checkpoint leaf {i} has shape {tuple(leaf.shape)}, "
                    f"artifact expects {tuple(aval.shape)} — wrong "
                    "checkpoint for this artifact?"
                )
            if leaf.dtype != aval.dtype:
                leaves[i] = leaf.astype(aval.dtype)
        self.variables = jax.tree.unflatten(treedef, leaves)
        self._call = jax.jit(self.exported.call)

    def predict(self, *args: np.ndarray) -> np.ndarray:
        """Stereo artifacts: ``predict(img_0, img_1, head_pose_0,
        head_pose_1)``. Multiview artifacts: ``predict(imgs, head_poses)``
        with stacked ``(N, V, H, W, 3)`` / ``(N, V, 2)`` inputs."""
        from rot_mvgaze_tpu.utils.padding import iter_padded_microbatches

        if len(args) != self.n_request:
            kind = (
                f"{self.num_views}-view (imgs, head_poses)"
                if self.num_views
                else "two-view (img_0, img_1, head_pose_0, head_pose_1)"
            )
            raise ValueError(
                f"this artifact serves {kind} requests: predict takes "
                f"{self.n_request} arrays, got {len(args)}"
            )
        n = int(args[0].shape[0])
        if n == 0:
            return np.zeros((0, 2), np.float32)
        outs = []
        for padded, bs in iter_padded_microbatches(
            tuple(args), self.micro_batch
        ):
            # images (the rank>=4 fields) stay uint8; poses cast to float32
            # regardless of their incoming dtype — the exported avals are
            # exact, so e.g. a uint8 pose would otherwise be a deep
            # jax.export aval-mismatch error instead of being served
            pred = self._call(
                self.variables,
                *(
                    a
                    if np.asarray(a).ndim >= 4
                    else np.asarray(a, np.float32)
                    for a in padded
                ),
            )
            outs.append(np.asarray(pred)[:bs])
        return np.concatenate(outs, axis=0)
