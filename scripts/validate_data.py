#!/usr/bin/env python
"""Corpus pre-flight validator.

Checks an ETH-XGaze / MPII-NV style HDF5 directory against everything the
framework (and the reference, /root/reference/dataset/gaze.py:52-73,120-122)
assumes, BEFORE a multi-hour training run fails on it:

- every subject listed in configs/subject/<dataset>.yaml exists;
- required datasets (face_patch, face_gaze, face_head_pose) are present with
  consistent leading dimension;
- face_patch is (N, H, W, 3) uint8, square, one resolution across subjects;
- N is a multiple of 18 (frame-major 18-camera layout the stereo pair index
  is built on);
- labels are finite and within plausible pitch/yaw range (|v| < pi).

Usage:
    python scripts/validate_data.py /data/xgaze --dataset xgaze
    python scripts/validate_data.py /data/mpiinv --dataset mpiinv [--strict]

Exit code 0 = usable (warnings possible), 1 = hard errors found.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REQUIRED = ("face_patch", "face_gaze", "face_head_pose")


def validate(root: str, dataset: str, strict: bool = False) -> int:
    import h5py
    import yaml

    proj = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(proj, "configs", "subject", f"{dataset}.yaml")) as f:
        subjects = yaml.safe_load(f)["subject"]

    errors, warnings = [], []
    resolutions = set()
    total = 0
    for name in subjects:
        path = os.path.join(root, name)
        if not os.path.exists(path):
            errors.append(f"missing subject archive: {name}")
            continue
        try:
            with h5py.File(path, "r") as f:
                missing = [k for k in REQUIRED if k not in f]
                if missing:
                    errors.append(f"{name}: missing datasets {missing}")
                    continue
                img, gaze, pose = (f[k] for k in REQUIRED)
                if img.ndim == 0 or img.shape[0] == 0:
                    errors.append(f"{name}: face_patch is empty")
                    continue
                n = img.shape[0]
                total += n
                if gaze.shape != (n, 2) or pose.shape != (n, 2):
                    errors.append(
                        f"{name}: label shapes {gaze.shape}/{pose.shape} "
                        f"!= ({n}, 2)"
                    )
                if img.ndim != 4 or img.shape[-1] != 3:
                    errors.append(f"{name}: face_patch shape {img.shape} "
                                  "is not (N, H, W, 3)")
                    continue
                if img.dtype != np.uint8:
                    errors.append(f"{name}: face_patch dtype {img.dtype} "
                                  "!= uint8")
                h, w = img.shape[1:3]
                if h != w:
                    warnings.append(
                        f"{name}: non-square patches {h}x{w} — torchvision "
                        "Resize(224) would resize the SHORTER side only; "
                        "this framework resizes both to 224"
                    )
                resolutions.add((h, w))
                if n % 18 != 0:
                    errors.append(
                        f"{name}: {n} rows is not a multiple of 18 — the "
                        "frame-major 18-camera pair index cannot be built"
                    )
                # full label scan — labels are (N, 2) floats, cheap even for
                # huge corpora; the one thing this tool must never do is
                # pass a corpus whose row 10000 is NaN
                g = np.asarray(gaze)
                p = np.asarray(pose)
                for lbl, arr in (("face_gaze", g), ("face_head_pose", p)):
                    if arr.size == 0:
                        errors.append(f"{name}: {lbl} is empty")
                    elif not np.isfinite(arr).all():
                        errors.append(f"{name}: non-finite values in {lbl}")
                    elif np.abs(arr).max() > np.pi:
                        warnings.append(
                            f"{name}: |{lbl}| up to {np.abs(arr).max():.2f} "
                            "> pi — expected radians pitchyaw"
                        )
        except OSError as e:
            errors.append(f"{name}: unreadable ({e})")

    if len(resolutions) > 1:
        warnings.append(
            f"mixed patch resolutions {sorted(resolutions)} — the native "
            "packed loader requires one resolution per pool (h5py loader OK)"
        )
    if resolutions and (224, 224) not in resolutions:
        warnings.append(
            f"patches stored at {sorted(resolutions)}, not 224x224 — the "
            "antialiased resize is torch-parity-tested (tests/"
            "test_resize_parity.py), but eval numbers were published at 224"
        )

    print(f"dataset={dataset} root={root}")
    print(f"subjects: {len(subjects)} listed, "
          f"{len(subjects) - sum(1 for e in errors if e.startswith('missing'))}"
          f" found; samples: {total}")
    for w in warnings:
        print(f"  WARN  {w}")
    for e in errors:
        print(f"  ERROR {e}")
    ok = not errors and not (strict and warnings)
    print("RESULT:", "OK" if ok else "FAIL")
    return 0 if ok else 1


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--dataset", required=True, choices=["xgaze", "mpiinv"])
    p.add_argument("--strict", action="store_true",
                   help="treat warnings as failures")
    a = p.parse_args()
    return validate(a.root, a.dataset, a.strict)


if __name__ == "__main__":
    sys.exit(main())
