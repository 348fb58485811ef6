"""PyTorch state-dict <-> flax variable-tree conversion.

The reference checkpoints are flat ``name -> tensor`` dicts produced by
``torch.save(model.state_dict())`` (/root/reference/trainer.py:150-160) over
``FeatRotationSymm`` (/root/reference/models/rot_mv.py:102-184). This module
builds an explicit bidirectional key map between those names and our flax
module tree, applying the layout transposes:

- Linear ``weight (out, in)``      -> Dense ``kernel (in, out)``
- Conv2d ``weight (O, I, kH, kW)`` -> Conv ``kernel (kH, kW, I, O)``
- BatchNorm ``weight/bias``        -> ``scale/bias`` (params collection)
- BatchNorm ``running_mean/var``   -> ``mean/var`` (batch_stats collection)
- ``num_batches_tracked``          -> dropped
- ``fc.*``                         -> dropped for the gaze model (present in
  the reference state dict but never called,
  /root/reference/models/resnet.py:201, rot_mv.py:124-129)

Reference torch key anatomy (named_modules dedups aliased share_weights
modules, so only index 0 appears for those):

    _feat_extractor.0.conv1.weight
    _feat_extractor.0.layer{L}.{B}.conv{k}.weight / .bn{k}.* / .downsample.{0,1}.*
    _lifter._lifter.blocks.{i}.0.{weight,bias}
    _img_fusers.{i}._fuser.blocks.{j}.0.{weight,bias}
    _img_fusers.{i}._batchnorm.running_mean          (share_feature only)
    _gaze_estimators.{i}.blocks.{j}.0.{weight,bias}
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Sequence, Tuple

import numpy as np

STAGE_SIZES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BOTTLENECK_DEPTHS = {50, 101, 152}

# Grouped/wide variants (/root/reference/models/resnet.py:326-399): their
# state-dict KEY structure is identical to the plain bottleneck nets (groups/
# width change tensor shapes, not names), so conversion only needs the right
# stage sizes. Keyed by constructor name; plain depths keep their int keys.
ARCH_STAGE_SIZES = {
    "resnext50_32x4d": (3, 4, 6, 3),
    "resnext101_32x8d": (3, 4, 23, 3),
    "wide_resnet50_2": (3, 4, 6, 3),
    "wide_resnet101_2": (3, 4, 23, 3),
}


def _arch_info(backbone) -> Tuple[Tuple[int, ...], bool]:
    """(stage_sizes, is_bottleneck) for an int depth or a variant name."""
    if isinstance(backbone, str) and backbone in ARCH_STAGE_SIZES:
        return ARCH_STAGE_SIZES[backbone], True  # all variants are bottleneck
    if isinstance(backbone, str):
        # "resnet50"-style names and numeric strings fall through by depth
        digits = "".join(c for c in backbone if c.isdigit())
        backbone = int(digits)
    return STAGE_SIZES[backbone], backbone in BOTTLENECK_DEPTHS


@dataclass(frozen=True)
class Entry:
    """One torch<->flax parameter-pair mapping.

    ``alias_of`` marks torch keys that are duplicates of another module's
    tensors (share_weights aliases a single fuser/head across ModuleList
    indices, /root/reference/models/rot_mv.py:151-158, and torch state_dicts
    emit every index). Aliased entries are consumed on load (values ignored)
    and re-emitted on export.
    """

    torch_key: str  # torch key WITHOUT the .weight/.bias/... suffix
    flax_path: Tuple[str, ...]  # path under the collection root
    kind: str  # 'conv' | 'bn' | 'linear' | 'intensity_bn'
    alias_of: Tuple[str, ...] = ()  # flax path this key duplicates ((), if none)


def _resnet_entries(
    depth, torch_prefix: str, flax_prefix: Tuple[str, ...]
) -> List[Entry]:
    """``depth`` is an int (18/34/50/101/152) or a variant name
    ('resnext50_32x4d', 'wide_resnet50_2', ...)."""
    stage_sizes, bottleneck = _arch_info(depth)
    expansion = 4 if bottleneck else 1
    entries = [
        Entry(f"{torch_prefix}conv1", flax_prefix + ("conv1",), "conv"),
        Entry(f"{torch_prefix}bn1", flax_prefix + ("bn1",), "bn"),
    ]
    n_convs = 3 if bottleneck else 2
    inplanes = 64
    for stage_i, num_blocks in enumerate(stage_sizes):
        planes = 64 * (2**stage_i)
        stride = 1 if stage_i == 0 else 2
        for block_i in range(num_blocks):
            t = f"{torch_prefix}layer{stage_i + 1}.{block_i}."
            f = flax_prefix + (f"layer{stage_i + 1}_{block_i}",)
            for k in range(1, n_convs + 1):
                entries.append(Entry(f"{t}conv{k}", f + (f"cb{k}", f"conv{k}"), "conv"))
                entries.append(Entry(f"{t}bn{k}", f + (f"cb{k}", f"bn{k}"), "bn"))
            has_down = block_i == 0 and (
                stride != 1 or inplanes != planes * expansion
            )
            if has_down:
                entries.append(
                    Entry(f"{t}downsample.0", f + ("downsample", "conv"), "conv")
                )
                entries.append(
                    Entry(f"{t}downsample.1", f + ("downsample", "bn"), "bn")
                )
            inplanes = planes * expansion
    return entries


def _mlp_entries(
    torch_prefix: str, flax_prefix: Tuple[str, ...], n_layers: int
) -> List[Entry]:
    return [
        Entry(
            f"{torch_prefix}blocks.{i}.0",
            flax_prefix + (f"dense_{i}",),
            "linear",
        )
        for i in range(n_layers)
    ]


def rot_mv_entries(
    backbone_depth: int = 50,
    num_iter: int = 3,
    share_weights: bool = False,
    encode_rotmat: bool = False,
    share_feature: bool = False,
    ignore_rotmat: bool = False,
) -> List[Entry]:
    """Full key map for FeatRotationSymm with the given config.

    Mirrors the module construction at /root/reference/models/rot_mv.py:117-184.
    """
    entries = _resnet_entries(backbone_depth, "_feat_extractor.0.", ("backbone",))
    entries += _mlp_entries("_lifter._lifter.", ("lifter", "lifter"), 2)

    fuser_layers = 3 if (encode_rotmat or share_feature) else 2
    for i in range(num_iter):
        # With share_weights all indices alias the index-0 module; load from
        # index 0 only, treat the rest as duplicates.
        flax_i = 0 if share_weights else i
        dup = share_weights and i > 0
        for e in _mlp_entries(
            f"_img_fusers.{i}._fuser.",
            (f"img_fuser_{flax_i}", "fuser"),
            fuser_layers,
        ):
            entries.append(
                Entry(e.torch_key, e.flax_path, e.kind, e.flax_path if dup else ())
            )
        if share_feature:
            entries.append(
                Entry(
                    f"_img_fusers.{i}._batchnorm",
                    (f"img_fuser_{flax_i}", "batchnorm"),
                    "intensity_bn",
                    (f"img_fuser_{flax_i}", "batchnorm") if dup else (),
                )
            )
        for e in _mlp_entries(
            f"_gaze_estimators.{i}.", (f"gaze_estimator_{flax_i}",), 2
        ):
            entries.append(
                Entry(e.torch_key, e.flax_path, e.kind, e.flax_path if dup else ())
            )
    return entries


def _insert(tree: Dict[str, Any], path: Sequence[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _lookup(tree: Mapping[str, Any], path: Sequence[str]) -> np.ndarray:
    node: Any = tree
    for p in path:
        node = node[p]
    return node


def convert_rot_mv_state_dict(
    state_dict: Mapping[str, np.ndarray], **config: Any
) -> Dict[str, Any]:
    """Torch FeatRotationSymm state dict -> {'params': ..., 'batch_stats': ...}.

    ``state_dict`` maps torch names to numpy arrays; ``config`` are the
    FeatRotationSymm constructor flags (backbone_depth, num_iter, ...).
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    first_key = {
        "conv": ".weight", "linear": ".weight",
        "bn": ".weight", "intensity_bn": ".running_mean",
    }
    for e in rot_mv_entries(**config):
        if e.alias_of and f"{e.torch_key}{first_key[e.kind]}" not in state_dict:
            # share_weights duplicate whose keys were deduplicated out of
            # the checkpoint (e.g. saved via named_parameters): the
            # canonical entry already supplies the same flax path
            continue
        if e.kind == "conv":
            w = np.asarray(state_dict[f"{e.torch_key}.weight"])
            _insert(params, e.flax_path + ("kernel",), w.transpose(2, 3, 1, 0))
        elif e.kind == "linear":
            w = np.asarray(state_dict[f"{e.torch_key}.weight"])
            b = np.asarray(state_dict[f"{e.torch_key}.bias"])
            _insert(params, e.flax_path + ("kernel",), w.T)
            _insert(params, e.flax_path + ("bias",), b)
        elif e.kind == "bn":
            _insert(
                params,
                e.flax_path + ("scale",),
                np.asarray(state_dict[f"{e.torch_key}.weight"]),
            )
            _insert(
                params,
                e.flax_path + ("bias",),
                np.asarray(state_dict[f"{e.torch_key}.bias"]),
            )
            _insert(
                batch_stats,
                e.flax_path + ("mean",),
                np.asarray(state_dict[f"{e.torch_key}.running_mean"]),
            )
            _insert(
                batch_stats,
                e.flax_path + ("var",),
                np.asarray(state_dict[f"{e.torch_key}.running_var"]),
            )
        elif e.kind == "intensity_bn":
            _insert(
                batch_stats,
                e.flax_path + ("running_mean",),
                np.asarray(state_dict[f"{e.torch_key}.running_mean"]),
            )
        else:  # pragma: no cover
            raise ValueError(f"unknown kind {e.kind}")
    return {"params": params, "batch_stats": batch_stats}


def flax_to_torch_state_dict(
    variables: Mapping[str, Any],
    strict_compatible: bool = False,
    **config: Any,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_rot_mv_state_dict` (for interop/round-trip).

    ``strict_compatible=True`` additionally synthesizes the keys the
    reference's ``load_state_dict(strict=True)`` requires but never uses:
    per-BN ``num_batches_tracked`` counters (zeros) and the backbone's
    ImageNet ``fc`` head (zeros; present-but-never-called,
    /root/reference/models/resnet.py:201, rot_mv.py:124-129).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for e in rot_mv_entries(**config):
        if e.kind == "conv":
            w = np.asarray(_lookup(params, e.flax_path + ("kernel",)))
            out[f"{e.torch_key}.weight"] = w.transpose(3, 2, 0, 1)
        elif e.kind == "linear":
            out[f"{e.torch_key}.weight"] = np.asarray(
                _lookup(params, e.flax_path + ("kernel",))
            ).T
            out[f"{e.torch_key}.bias"] = np.asarray(
                _lookup(params, e.flax_path + ("bias",))
            )
        elif e.kind == "bn":
            out[f"{e.torch_key}.weight"] = np.asarray(
                _lookup(params, e.flax_path + ("scale",))
            )
            out[f"{e.torch_key}.bias"] = np.asarray(
                _lookup(params, e.flax_path + ("bias",))
            )
            out[f"{e.torch_key}.running_mean"] = np.asarray(
                _lookup(batch_stats, e.flax_path + ("mean",))
            )
            out[f"{e.torch_key}.running_var"] = np.asarray(
                _lookup(batch_stats, e.flax_path + ("var",))
            )
        elif e.kind == "intensity_bn":
            out[f"{e.torch_key}.running_mean"] = np.asarray(
                _lookup(batch_stats, e.flax_path + ("running_mean",))
            )
        if strict_compatible and e.kind == "bn":
            out[f"{e.torch_key}.num_batches_tracked"] = np.asarray(
                0, dtype=np.int64
            )
    if strict_compatible:
        depth = config.get("backbone_depth", 50)
        _, bottleneck = _arch_info(depth)
        feat_dim = 512 * (4 if bottleneck else 1)
        out["_feat_extractor.0.fc.weight"] = np.zeros(
            (1000, feat_dim), np.float32
        )
        out["_feat_extractor.0.fc.bias"] = np.zeros((1000,), np.float32)
    return out


def convert_resnet_state_dict(
    state_dict: Mapping[str, np.ndarray],
    depth,
    include_fc: bool = False,
) -> Dict[str, Any]:
    """Plain torchvision-format ResNet state dict -> flax variables.

    Used to initialize the backbone from ImageNet-pretrained weights — the
    reference downloads these at model construction
    (/root/reference/models/resnet.py:278-283, rot_mv.py:120-122); here they
    are loaded from a local file (``--pretrained_backbone``). ``depth``
    accepts an int or a variant name ('resnext50_32x4d', 'wide_resnet50_2',
    ... — /root/reference/models/resnet.py:326-399); grouped conv weights use
    the same (O, I/g, kH, kW) -> (kH, kW, I/g, O) transpose as plain convs.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for e in _resnet_entries(depth, "", ()):
        if e.kind == "conv":
            w = np.asarray(state_dict[f"{e.torch_key}.weight"])
            _insert(params, e.flax_path + ("kernel",), w.transpose(2, 3, 1, 0))
        elif e.kind == "bn":
            _insert(params, e.flax_path + ("scale",),
                    np.asarray(state_dict[f"{e.torch_key}.weight"]))
            _insert(params, e.flax_path + ("bias",),
                    np.asarray(state_dict[f"{e.torch_key}.bias"]))
            _insert(batch_stats, e.flax_path + ("mean",),
                    np.asarray(state_dict[f"{e.torch_key}.running_mean"]))
            _insert(batch_stats, e.flax_path + ("var",),
                    np.asarray(state_dict[f"{e.torch_key}.running_var"]))
    if include_fc and "fc.weight" in state_dict:
        _insert(params, ("fc", "kernel"), np.asarray(state_dict["fc.weight"]).T)
        _insert(params, ("fc", "bias"), np.asarray(state_dict["fc.bias"]))
    return {"params": params, "batch_stats": batch_stats}


def load_pretrained_backbone(
    variables: Dict[str, Any], ckpt_path: str, depth: int
) -> Dict[str, Any]:
    """Return a copy of FeatRotationSymm ``variables`` with the backbone
    replaced by a torchvision ResNet checkpoint's weights."""
    sd = load_torch_state_dict(ckpt_path)
    backbone = convert_resnet_state_dict(sd, depth)
    out = {
        "params": dict(variables["params"]),
        "batch_stats": dict(variables.get("batch_stats", {})),
    }
    out["params"]["backbone"] = backbone["params"]
    out["batch_stats"]["backbone"] = backbone["batch_stats"]
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth.tar`` checkpoint into a name->numpy dict (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def check_conversion_coverage(
    state_dict: Mapping[str, np.ndarray], **config: Any
) -> List[str]:
    """Return torch keys NOT consumed by the conversion (minus known-unused).

    The reference state dict carries ``fc.*`` (never called) and
    ``num_batches_tracked`` counters; anything else left over indicates a
    config mismatch with the checkpoint.
    """
    consumed = set()
    for e in rot_mv_entries(**config):
        if e.kind == "conv":
            consumed.add(f"{e.torch_key}.weight")
        elif e.kind == "linear":
            consumed.update({f"{e.torch_key}.weight", f"{e.torch_key}.bias"})
        elif e.kind == "bn":
            consumed.update(
                {
                    f"{e.torch_key}.weight",
                    f"{e.torch_key}.bias",
                    f"{e.torch_key}.running_mean",
                    f"{e.torch_key}.running_var",
                }
            )
        elif e.kind == "intensity_bn":
            consumed.add(f"{e.torch_key}.running_mean")
    leftover = []
    for k in state_dict:
        if k in consumed:
            continue
        if k.endswith("num_batches_tracked"):
            continue
        if ".fc." in k or k.startswith("fc."):
            continue
        leftover.append(k)
    return sorted(leftover)
