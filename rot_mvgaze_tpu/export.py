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
    micro_batch: int, image_size: int
) -> Tuple[jax.ShapeDtypeStruct, ...]:
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
) -> "jax_export.Exported":
    """Trace + serialize the serving forward; returns the Exported object.

    ``variables`` supplies only the pytree STRUCTURE and dtypes (values are
    not baked in); pass the checkpoint you intend to serve or a fresh
    ``model.init`` result of the same architecture.
    """
    if "quant" in variables or getattr(model, "int8_backbone", False) == "static":
        raise ValueError(
            "static-int8 models cannot be exported: the calibrated `quant` "
            "ranges are live-serving state that checkpoint loaders do not "
            "reconstruct. Export the dynamic int8 graph (int8=True) or "
            "bf16/f32 instead."
        )
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
        var_avals, *_abstract_batch(micro_batch, image_size)
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
        # in_avals: (variables-pytree leaves..., img_0, img_1, pose_0, pose_1)
        img_aval = self.exported.in_avals[-4]
        self.micro_batch = int(img_aval.shape[0])
        self.image_size = int(img_aval.shape[1])
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
        if len(self.exported.in_avals) != len(leaves) + 4:
            raise ValueError(
                f"artifact expects {len(self.exported.in_avals) - 4} "
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

    def predict(
        self,
        img_0: np.ndarray,
        img_1: np.ndarray,
        head_pose_0: np.ndarray,
        head_pose_1: np.ndarray,
    ) -> np.ndarray:
        from rot_mvgaze_tpu.utils.padding import iter_padded_microbatches

        n = int(img_0.shape[0])
        if n == 0:
            return np.zeros((0, 2), np.float32)
        outs = []
        for (i0, i1, h0, h1), bs in iter_padded_microbatches(
            (img_0, img_1, head_pose_0, head_pose_1), self.micro_batch
        ):
            pred = self._call(
                self.variables,
                i0,
                i1,
                h0.astype(np.float32),
                h1.astype(np.float32),
            )
            outs.append(np.asarray(pred)[:bs])
        return np.concatenate(outs, axis=0)
