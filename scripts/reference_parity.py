#!/usr/bin/env python
"""One-command "step 0" parity harness (BASELINE.md:86-89).

Produces the four-number protocol table — mean angular error (deg) for
``xgaze2mpiinv_known / xgaze2mpiinv_novel / mpiinv2xgaze_known /
mpiinv2xgaze_novel`` — by running OUR ``Trainer.test`` from a reference
``.pth.tar`` checkpoint per protocol, and (optionally) the reference's own
eval loop executed in place from the same checkpoint over the same corpus
and the same frozen pair index, reporting the per-protocol delta against
the <=0.1 deg budget (BASELINE.json).

The day the released checkpoints + datasets exist (zero-egress here —
/root/reference/README.md:45-50 links, VERDICT "What's missing" #1):

    python scripts/reference_parity.py \
        --ckpt_dir CKPTS --xgaze_dir XGAZE --mpiinv_dir MPIINV \
        --run_reference

with ``CKPTS/<protocol>.pth.tar`` per protocol (or ``--ckpt
protocol=path`` overrides). ``--run_reference`` additionally runs the
reference eval (/root/reference/trainer.py:164-199, via
tests/reference_harness.py's executed-in-place import) to establish the
ground-truth numbers the repo never published.

Validated today in rehearsal mode — synthetic corpora + a
reference-TRAINED checkpoint, every link exercised end-to-end:

    python scripts/reference_parity.py --rehearse

which writes two tiny synthetic corpora (one per dataset), trains the
reference itself a few optimizer steps, saves its ``.pth.tar``, then runs
the full four-protocol table through the exact code path above and FAILS
(exit 1) if any delta exceeds 0.1 deg.

Protocol fidelity notes:
- Pair index: both sides draw the reference's globally-seeded
  train-then-test ``random.choice`` sequence
  (/root/reference/dataset/gaze.py:60-73, main.py:216,224); ours replays
  it via ``pairing="reference"`` with one shared ``random.Random(seed)``.
- Transform: the reference's test transform (main.py:51-56) is
  ToTensor -> Resize(224) -> Normalize; corpora/datasets store patches AT
  the eval size (true for real XGaze/MPII-NV 224^2 patches and for the
  rehearsal corpora), making Resize the identity, so the stand-in
  transform used here is numerically exact without torchvision.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import random
import sys
import tempfile
from types import SimpleNamespace

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))

PROTOCOLS = (
    "xgaze2mpiinv_known",
    "xgaze2mpiinv_novel",
    "mpiinv2xgaze_known",
    "mpiinv2xgaze_novel",
)

#: exp_name -> ((train_name, train_color), (test_name, test_color),
#:              cam_train, cam_test) — the mapping of
#: /root/reference/main.py:121-209 (shared with cli.main.configure_dataset).
def protocol_spec(exp_name: str):
    dataset_setting, headpose_setting = exp_name.split("_")
    cams = {
        "known": ("all", "all"),
        "novel": ("novel_train", "novel_test"),
    }[headpose_setting]
    ds = {
        "xgaze2mpiinv": (("xgaze", "bgr"), ("mpiinv", "rgb")),
        "mpiinv2xgaze": (("mpiinv", "rgb"), ("xgaze", "bgr")),
    }[dataset_setting]
    return ds[0], ds[1], cams[0], cams[1]


def load_subjects(dataset_name: str) -> list:
    import yaml

    with open(osp.join(REPO, "configs", "subject", f"{dataset_name}.yaml")) as f:
        return list(yaml.safe_load(f)["subject"])


# ---------------------------------------------------------------- our side
def run_our_eval(
    exp_name: str,
    ckpt: str,
    roots: dict,
    subjects: dict,
    model_cfg: dict,
    image_size: int,
    batch_size: int,
    seed: int,
    out_dir: str,
) -> float:
    """Our ``--mode test`` over the protocol's corpus + frozen pair index
    (the eval wiring of cli/main.py, with explicit subject lists so the
    same function serves real and rehearsal corpora)."""
    from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
    from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
    from rot_mvgaze_tpu.models import FeatRotationSymm
    from rot_mvgaze_tpu.train import Trainer

    (train_name, train_color), (test_name, test_color), cam_train, cam_test = (
        protocol_spec(exp_name)
    )
    # ONE replayed generator across train-then-test construction — the
    # reference's global-`random` draw-order dependency (main.py:216,224)
    pair_rng = random.Random(seed)
    ours_train = GazeDataset(
        train_name, roots[train_name], train_color, subjects[train_name],
        camera_tag=cam_train, seed=seed, pairing="reference",
        pair_rng=pair_rng,
    )
    ours_test = GazeDataset(
        test_name, roots[test_name], test_color, subjects[test_name],
        camera_tag=cam_test, seed=seed, pairing="reference",
        pair_rng=pair_rng,
    )
    cfg = SimpleNamespace(
        mode="test", exp_name=exp_name, output_dir=out_dir,
        ckpt_resume=ckpt, print_freq=10**9, seed=seed,
        batch_size=batch_size, test_batch_size=batch_size, epochs=1,
        save_epoch=10**9, image_size=image_size, scheduler_step="epoch",
    )
    model = FeatRotationSymm(**model_cfg)
    metrics = IterationLoss(loss=StereoL1Loss(rel_weight=0.01),
                            iter_decay=0.5)
    trainer = Trainer(
        cfg, model, metrics,
        BatchLoader(ours_train, batch_size=batch_size, shuffle=True,
                    drop_last=True),
        BatchLoader(ours_test, batch_size=batch_size),
    )
    err = float(trainer.test(-1))
    ours_train.close()
    ours_test.close()
    return err


# ---------------------------------------------------------- reference side
def _reference_transform(image_size: int):
    """Numerically exact stand-in for /root/reference/main.py:51-56 (see
    module docstring: stored patches are AT the eval size, Resize is the
    identity; torchvision is not needed)."""
    import torch

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

    def transform(img_uint8_hwc):
        assert img_uint8_hwc.shape[:2] == (image_size, image_size), (
            f"stored patch is {img_uint8_hwc.shape[:2]}, eval size is "
            f"{image_size}: the identity-Resize stand-in does not apply; "
            "store patches at the eval size"
        )
        x = torch.from_numpy(
            np.ascontiguousarray(img_uint8_hwc.transpose(2, 0, 1))
        ).float() / 255.0
        return (x - mean) / std

    return transform


def run_reference_eval(
    exp_name: str,
    ckpt: str,
    roots: dict,
    subjects: dict,
    model_cfg: dict,
    image_size: int,
    batch_size: int,
    seed: int,
    out_dir: str,
) -> float:
    """The reference's own eval (trainer.py:164-199) executed in place."""
    import torch
    from torch.utils.data import DataLoader

    from reference_harness import (
        import_reference_dataset,
        import_reference_models,
        import_reference_trainer,
    )

    ref_gaze = import_reference_dataset()
    ref_trainer_mod = import_reference_trainer()
    import_reference_models()
    import losses.stereo_loss as ref_stereo  # type: ignore
    import models.rot_mv as ref_rot_mv  # type: ignore

    (train_name, train_color), (test_name, test_color), cam_train, cam_test = (
        protocol_spec(exp_name)
    )
    # the reference protocol: seed the global generators, build train
    # dataset then test dataset (main.py:216,224)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    transform = _reference_transform(image_size)
    ref_train = ref_gaze.GazeDataset(
        dataset_name=train_name, dataset_path=roots[train_name],
        color_type=train_color, image_transform=transform,
        keys_to_use=subjects[train_name], camera_tag=cam_train, stereo=True,
    )
    ref_test = ref_gaze.GazeDataset(
        dataset_name=test_name, dataset_path=roots[test_name],
        color_type=test_color, image_transform=transform,
        keys_to_use=subjects[test_name], camera_tag=cam_test, stereo=True,
    )
    model = ref_rot_mv.FeatRotationSymm(**model_cfg)
    metrics = ref_stereo.IterationLoss(
        loss=ref_stereo.StereoL1Loss(
            rel_weight=0.01, reference_decay=1.0,
            distance_metric="angular_error", pred_gaze_key="pred_gaze",
        ),
        iter_decay=0.5,
    )
    config = SimpleNamespace(
        ckpt_resume=None, batch_size=batch_size, output_dir=out_dir,
        print_freq=10**9, save_epoch=10**9, seed=seed,
    )
    trainer = ref_trainer_mod.Trainer(
        config=config, model=model, metrics=metrics,
        train_loader=DataLoader(ref_train, batch_size=batch_size,
                                shuffle=True, num_workers=0),
        test_loader=DataLoader(ref_test, batch_size=batch_size,
                               shuffle=False, num_workers=0),
    )
    sd = torch.load(ckpt, map_location="cpu", weights_only=True)
    trainer.model.load_state_dict(sd, strict=True)
    return float(trainer.test(-1))


# ------------------------------------------------------------- rehearsal
def build_rehearsal_assets(work_dir: str, model_cfg: dict, image_size: int,
                           batch_size: int, seed: int):
    """Synthetic corpora (one root per dataset) + ONE reference-trained
    checkpoint evaluated under all four protocols (eval parity does not
    depend on which protocol trained the weights)."""
    import torch
    from torch.utils.data import DataLoader

    from reference_harness import (
        import_reference_dataset,
        import_reference_models,
        import_reference_trainer,
    )
    from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset

    roots, subjects = {}, {}
    for name, nametag in (("xgaze", "x"), ("mpiinv", "m")):
        root = osp.join(work_dir, name)
        os.makedirs(root, exist_ok=True)
        subjects[name] = write_synthetic_dataset(
            root, [f"{nametag}00.h5", f"{nametag}01.h5"], n_frames=3,
            image_size=image_size,
        )
        roots[name] = root

    ref_gaze = import_reference_dataset()
    ref_trainer_mod = import_reference_trainer()
    import_reference_models()
    import losses.stereo_loss as ref_stereo  # type: ignore
    import models.rot_mv as ref_rot_mv  # type: ignore

    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    transform = _reference_transform(image_size)
    train_ds = ref_gaze.GazeDataset(
        dataset_name="xgaze", dataset_path=roots["xgaze"], color_type="bgr",
        image_transform=transform, keys_to_use=subjects["xgaze"],
        camera_tag="all", stereo=True,
    )
    model = ref_rot_mv.FeatRotationSymm(**model_cfg)
    metrics = ref_stereo.IterationLoss(
        loss=ref_stereo.StereoL1Loss(
            rel_weight=0.01, reference_decay=1.0,
            distance_metric="angular_error", pred_gaze_key="pred_gaze",
        ),
        iter_decay=0.5,
    )
    out_dir = osp.join(work_dir, "ref_train_logs")
    os.makedirs(out_dir, exist_ok=True)
    trainer = ref_trainer_mod.Trainer(
        config=SimpleNamespace(ckpt_resume=None, batch_size=batch_size,
                               output_dir=out_dir, print_freq=10**9,
                               save_epoch=10**9, seed=seed),
        model=model, metrics=metrics,
        train_loader=DataLoader(train_ds, batch_size=batch_size,
                                shuffle=True, num_workers=0),
        test_loader=DataLoader(train_ds, batch_size=batch_size,
                               shuffle=False, num_workers=0),
    )
    trainer.train_one_epoch(0)  # a few real optimizer steps
    ckpt = osp.join(work_dir, "rehearsal.pth.tar")
    torch.save(model.state_dict(), ckpt)
    return roots, subjects, {p: ckpt for p in PROTOCOLS}


# ------------------------------------------------------------------ main
def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--ckpt_dir", default=None,
                    help="directory with <protocol>.pth.tar checkpoints")
    ap.add_argument("--ckpt", action="append", default=[],
                    metavar="PROTOCOL=PATH",
                    help="per-protocol checkpoint override (repeatable)")
    ap.add_argument("--xgaze_dir", default=None, help="XGaze h5 root")
    ap.add_argument("--mpiinv_dir", default=None, help="MPII-NV h5 root")
    ap.add_argument("--run_reference", action="store_true",
                    help="also run the reference eval in place (needs torch "
                         "+ /root/reference)")
    ap.add_argument("--rehearse", action="store_true",
                    help="validate the whole harness today: synthetic "
                         "corpora + a reference-trained ckpt; fails if any "
                         "delta > 0.1 deg")
    ap.add_argument("--protocols", nargs="+", default=list(PROTOCOLS),
                    choices=list(PROTOCOLS))
    ap.add_argument("--backbone_depth", type=int, default=50)
    ap.add_argument("--num_iter", type=int, default=3)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="also write the table as JSON here")
    args = ap.parse_args(argv)

    model_cfg = dict(
        backbone_depth=args.backbone_depth, num_iter=args.num_iter,
        share_weights=False, encode_rotmat=False, share_feature=False,
        ignore_rotmat=False,
    )

    work = tempfile.mkdtemp(prefix="reference_parity_")
    if args.rehearse:
        # small enough to finish in minutes on CPU, large enough to train
        args.image_size = 32
        args.batch_size = 9
        model_cfg.update(backbone_depth=18, num_iter=2)
        print(f"[rehearse] building synthetic assets under {work} ...")
        roots, subjects, ckpts = build_rehearsal_assets(
            work, model_cfg, args.image_size, args.batch_size, args.seed
        )
        args.run_reference = True
    else:
        if not (args.xgaze_dir and args.mpiinv_dir):
            ap.error("--xgaze_dir and --mpiinv_dir are required (or "
                     "--rehearse)")
        roots = {"xgaze": args.xgaze_dir, "mpiinv": args.mpiinv_dir}
        subjects = {n: load_subjects(n) for n in ("xgaze", "mpiinv")}
        overrides = dict(kv.split("=", 1) for kv in args.ckpt)
        unknown = set(overrides) - set(PROTOCOLS)
        if unknown:
            ap.error(f"unknown protocol(s) in --ckpt: {sorted(unknown)}")
        ckpts = {}
        for p in args.protocols:
            path = overrides.get(
                p, osp.join(args.ckpt_dir or "", f"{p}.pth.tar")
            )
            if not osp.isfile(path):
                ap.error(f"no checkpoint for {p}: {path} (use --ckpt_dir "
                         f"with <protocol>.pth.tar files or --ckpt {p}=PATH)")
            ckpts[p] = path

    rows = []
    for p in args.protocols:
        print(f"\n=== {p} (ckpt: {ckpts[p]}) ===")
        ref_err = None
        if args.run_reference:
            print(f"[{p}] reference eval (executed in place) ...")
            ref_err = run_reference_eval(
                p, ckpts[p], roots, subjects, model_cfg, args.image_size,
                args.batch_size, args.seed, osp.join(work, f"ref_{p}"),
            )
        print(f"[{p}] our eval ...")
        our_err = run_our_eval(
            p, ckpts[p], roots, subjects, model_cfg, args.image_size,
            args.batch_size, args.seed, osp.join(work, f"ours_{p}"),
        )
        delta = None if ref_err is None else abs(our_err - ref_err)
        rows.append({"protocol": p, "reference_deg": ref_err,
                     "ours_deg": our_err, "delta_deg": delta})

    fmt = lambda v: "—" if v is None else f"{v:.4f}"
    print("\n| Protocol | reference (deg) | ours (deg) | delta (deg) |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['protocol']} | {fmt(r['reference_deg'])} | "
              f"{fmt(r['ours_deg'])} | {fmt(r['delta_deg'])} |")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "budget_deg": 0.1,
                       "rehearsal": bool(args.rehearse)}, f, indent=2)
        print(f"\nwrote {args.out}")

    bad = [r for r in rows
           if r["delta_deg"] is not None and r["delta_deg"] > 0.1]
    if bad:
        print(f"\nPARITY VIOLATED (>0.1 deg): "
              f"{[r['protocol'] for r in bad]}", file=sys.stderr)
        return 1
    if args.run_reference:
        print("\nall protocols within the 0.1 deg budget")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
