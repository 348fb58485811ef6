"""Helper to import the read-only reference implementation for parity tests.

The reference (/root/reference) is a PyTorch codebase with several
unused-but-imported dependencies that may be absent here (albumentations,
omegaconf, torchvision, torchsummary, ...). This harness imports the REAL
module when it is installed (h5py, cv2, rich, tqdm are present in this image)
and stubs only what is missing, then imports the reference's code so tests
can compare numerical outputs. Nothing from the reference is copied — it is
executed in place as a golden oracle. All parity tests skip cleanly when the
reference tree or torch is unavailable.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

# Modules the reference imports; stubbed ONLY if not actually installed.
_MAYBE_STUB_MODULES = [
    "albumentations",
    "cv2",
    "h5py",
    "omegaconf",
    "torchsummary",
    "torchvision",
    "torchvision.models",
    "torchvision.transforms",
    "torchvision.utils",
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


def _install_stubs() -> None:
    """Import real dependencies where present; stub the missing ones."""
    for name in _MAYBE_STUB_MODULES:
        if name in sys.modules:
            continue
        try:
            __import__(name)
            continue  # real module available
        except ImportError:
            pass
        mod = types.ModuleType(name)
        if name == "omegaconf":
            class _OmegaConf:  # minimal surface trainer.py:70 touches
                @staticmethod
                def save(config, path):
                    with open(path, "w") as f:
                        f.write(repr(config))

                @staticmethod
                def create(obj=None):
                    return obj

            mod.OmegaConf = _OmegaConf
            mod.ListConfig = object
            mod.DictConfig = object
        if name == "torchsummary":
            mod.summary = lambda *a, **kw: None
        if name == "torchvision.utils":
            mod.make_grid = lambda *a, **kw: None
        if name == "rich.progress":
            mod.track = lambda x, **kw: x
        if name == "tqdm":
            mod.tqdm = lambda x, **kw: x
        sys.modules[name] = mod
    # attach submodule stubs onto their parent packages
    for parent, child in (
        ("torchvision", "models"),
        ("torchvision", "transforms"),
        ("torchvision", "utils"),
        ("rich", "progress"),
    ):
        full = f"{parent}.{child}"
        if parent in sys.modules and full in sys.modules:
            if not hasattr(sys.modules[parent], child):
                setattr(sys.modules[parent], child, sys.modules[full])


def _enter_reference_path() -> None:
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def import_reference_models():
    """Import the reference's ``models.rot_mv`` / ``models.resnet`` modules.

    Returns (rot_mv_module, resnet_module) with pretrained-weight downloads
    disabled (this container has no egress; the reference hardcodes
    ``pretrained=True`` at /root/reference/models/rot_mv.py:120-122).
    """
    _enter_reference_path()

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


def import_reference_dataset():
    """Import the reference's ``dataset.gaze`` with the REAL h5py/cv2.

    Used by the pairing-equality and end-to-end rehearsal tests: the
    reference ``GazeDataset`` is constructed in place over synthetic HDF5
    corpora so its frozen stereo pair index
    (/root/reference/dataset/gaze.py:60-73) is the oracle.
    """
    import h5py  # noqa: F401  (must be the real module, not a stub)

    _enter_reference_path()
    import dataset.gaze as ref_gaze  # type: ignore

    return ref_gaze


def import_reference_trainer():
    """Import the reference's ``trainer`` module, runnable on CPU.

    Patches around the reference's broken-as-shipped import
    (``trainer.py:25`` imports ``recover_image`` from ``utils.helper`` where
    it is never defined — see SURVEY.md §2) by injecting a no-op with that
    name before the import executes. torchsummary/torchvision/omegaconf are
    stubbed if absent; tensorboard's SummaryWriter is real.
    """
    _enter_reference_path()
    import utils.helper as ref_helper  # type: ignore

    if not hasattr(ref_helper, "recover_image"):
        ref_helper.recover_image = lambda *a, **kw: None
    import trainer as ref_trainer  # type: ignore

    return ref_trainer
