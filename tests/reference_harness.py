"""Helper to import the read-only reference implementation for parity tests.

The reference (/root/reference) is a PyTorch codebase with several
unused-but-imported dependencies that are absent here (albumentations,
omegaconf, torchvision, cv2, h5py, ...). This harness stubs those module
names and imports the reference's model code so tests can compare numerical
outputs. Nothing from the reference is copied — it is executed in place as a
golden oracle. All parity tests skip cleanly when the reference tree or torch
is unavailable.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_STUB_MODULES = [
    "albumentations",
    "cv2",
    "h5py",
    "omegaconf",
    "torchvision",
    "torchvision.models",
    "torchvision.transforms",
    "rich",
    "rich.progress",
    "tqdm",
]


def reference_available() -> bool:
    if not os.path.isdir(REFERENCE_ROOT):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


def import_reference_models():
    """Import the reference's ``models.rot_mv`` / ``models.resnet`` modules.

    Returns (rot_mv_module, resnet_module) with pretrained-weight downloads
    disabled (this container has no egress; the reference hardcodes
    ``pretrained=True`` at /root/reference/models/rot_mv.py:120-122).
    """
    for name in _STUB_MODULES:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "omegaconf":
                mod.OmegaConf = object
                mod.ListConfig = object
                mod.DictConfig = object
            if name == "rich.progress":
                mod.track = lambda x, **kw: x
            if name == "tqdm":
                mod.tqdm = lambda x, **kw: x
            sys.modules[name] = mod

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import models.resnet as ref_resnet  # type: ignore
    import models.rot_mv as ref_rot_mv  # type: ignore

    # Disable pretrained downloads: swap the constructors the model calls for
    # pretrained=False versions.
    ref_rot_mv.resnet18 = lambda pretrained=True: ref_resnet.resnet18(False)
    ref_rot_mv.resnet50 = lambda pretrained=True: ref_resnet.resnet50(False)
    return ref_rot_mv, ref_resnet


def import_reference_augment():
    """Import the reference's ``utils.augment`` (RandomMultiErasing oracle,
    /root/reference/utils/augment.py:10-47 — pure torch, runnable today)."""
    import_reference_models()  # installs stubs + sys.path
    import utils.augment as ref_augment  # type: ignore

    return ref_augment
