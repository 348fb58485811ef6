"""Command-line entry point, flag-compatible with /root/reference/main.py.

Usage (identical to the reference, /root/reference/main.py:65-118,210-257)::

    python main.py --exp_name {xgaze2mpiinv,mpiinv2xgaze,xgaze,mpiinv}_{known,novel} \
        --mode {train,test} [--ckpt_resume PATH] [--batch_size N] ...

Dataset roots come from ``data_path.yaml`` next to the repo's ``main.py``
(user-created, /root/reference/README.md:22-26) with keys ``xgaze``/``mpiinv``.
Extra flags beyond the reference: ``--backbone_depth``, ``--num_iter``,
``--scheduler_step``, ``--image_size``, ``--bf16``, ``--remat``,
``--fuse_views``, ``--native_loader``, ``--use_pallas_fusion``,
``--use_pallas_bn``, ``--pretrained_backbone``, ``--auto_resume_dir``,
``--share_weights/--encode_rotmat/--share_feature/--ignore_rotmat`` (the
reference hardcodes the shipped config at main.py:231-236).

The reference ignores ``--epochs`` and always trains 15
(/root/reference/trainer.py:65); here ``--epochs`` is honored, with the same
default of 15.
"""

from __future__ import annotations

import argparse
import datetime
import os
import os.path as osp
import sys
from types import SimpleNamespace
from typing import Optional, Tuple

import yaml

PROJ_DIR = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def get_parser(**kwargs) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(**kwargs)
    p.add_argument("--mode", type=str, choices=["train", "test"], default="train")
    p.add_argument("--exp_name", type=str)
    p.add_argument("-out", "--output_dir", type=str, default="./logs")
    # --ckpt_pretrained is accepted as an alias: the reference README
    # documents that name while the code implements --ckpt_resume
    # (/root/reference/README.md:55 vs main.py:89).
    p.add_argument("--ckpt_resume", "--ckpt_pretrained", dest="ckpt_resume",
                   type=str, default=None,
                   help="resume from checkpoint (.msgpack or torch .pth.tar)")
    p.add_argument("--pretrained_backbone", type=str, default=None,
                   help="initialize the backbone from a torchvision ResNet "
                        "checkpoint file, or 'auto' to download it from the "
                        "MODEL_URLS table with checksum verification (the "
                        "reference's one-command ImageNet bootstrap; fails "
                        "with instructions in zero-egress environments)")
    p.add_argument("--print_freq", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=8,
                   help="host loader threads")
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--test_batch_size", type=int, default=50)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--save_epoch", type=int, default=10)
    # --- extensions over the reference CLI ---
    # the reference supports only 18/50 (/root/reference/models/rot_mv.py:
    # 119-122); the full vendored family is usable here, including the
    # grouped/wide variants (/root/reference/models/resnet.py:326-399)
    def backbone_arg(v):
        allowed = {"18", "34", "50", "101", "152",
                   "resnext50_32x4d", "resnext101_32x8d",
                   "wide_resnet50_2", "wide_resnet101_2"}
        if str(v) not in allowed:
            raise argparse.ArgumentTypeError(
                f"backbone must be one of {sorted(allowed)}"
            )
        return int(v) if str(v).isdigit() else str(v)

    p.add_argument("--backbone_depth", type=backbone_arg, default=50,
                   help="18/34/50/101/152 or a variant name "
                        "(resnext50_32x4d, resnext101_32x8d, "
                        "wide_resnet50_2, wide_resnet101_2)")
    p.add_argument("--num_iter", type=int, default=3)
    p.add_argument("--num_views", type=int, default=2,
                   help="views per sample. 2 (default) = the reference's "
                        "stereo protocol. >2 switches to the framework-"
                        "added V-view model/dataset (models/multiview.py: "
                        "each view fuses the MEAN of the others rotated "
                        "into its frame; reduces exactly to the stereo "
                        "model at V=2 in eval mode — training merges BN "
                        "stats across views like --fuse_views — and stereo "
                        "checkpoints load at any V). "
                        "Stereo-only options (grad_accum, "
                        "spatial_partition, encode_rotmat, share_feature, "
                        "pallas paths, fuse_views) are rejected")
    p.add_argument("--share_weights", type=str2bool, default=False)
    p.add_argument("--encode_rotmat", type=str2bool, default=False)
    p.add_argument("--share_feature", type=str2bool, default=False)
    p.add_argument("--ignore_rotmat", type=str2bool, default=False)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--scheduler_step", type=str, default="epoch",
                   choices=["epoch", "iteration"],
                   help="'epoch' reproduces the reference's per-epoch "
                        "CyclicLR stepping quirk")
    p.add_argument("--bf16", type=str2bool, default=True,
                   help="bfloat16 training compute (params stay f32; eval "
                        "always runs f32 so the metric is unaffected). This "
                        "default matches the benched configuration "
                        "(docs/PERF.md); --bf16 false for f32 training")
    p.add_argument("--data_path", type=str, default=None,
                   help="override path to data_path.yaml")
    p.add_argument("--native_loader", type=str2bool, default=True,
                   help="use the C++ packed-cache loader (falls back to the "
                        "h5py thread loader if unavailable)")
    p.add_argument("--use_pallas_fusion", type=str2bool, default=False,
                   help="Pallas fused rotate+concat+GEMM fusion kernels")
    def pallas_bn_arg(v):
        if str(v).lower() == "residual":
            return "residual"
        return str2bool(v)

    p.add_argument("--use_pallas_bn", type=pallas_bn_arg, default=False,
                   help="Pallas fused train-mode BatchNorm(+ReLU+residual): "
                        "true = every BN (measured slower, docs/PERF.md r1); "
                        "'residual' = block-tail BNs only (r3 experiment)")
    p.add_argument("--bn_stat_subsample", type=int, default=1,
                   help="ghost-stat BN: compute train-mode batch statistics "
                        "from every k-th batch row only (cuts the stat-"
                        "reduce HBM pass ~k-fold; noisier stats — an opt-in "
                        "training-dynamics deviation from the reference, "
                        "like --fuse_views; measured in docs/PERF.md r3)")
    p.add_argument("--freeze_bn", type=str2bool, default=False,
                   help="fine-tuning recipe: every normalization layer uses "
                        "its RUNNING statistics during training (a pure "
                        "trainable affine; batch_stats never update). "
                        "Intended with --pretrained_backbone/--ckpt_resume; "
                        "also deletes the per-step BN stat reductions "
                        "(~15%% of step time, docs/PERF.md). OFF by default "
                        "so training dynamics match the reference")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="exponential moving average of the weights, updated "
                        "inside the jitted step (ema <- d*ema + (1-d)*params "
                        "after each optimizer update). Eval, --export_torch "
                        "and serving/export then use the EMA weights; "
                        "checkpoints carry both trees. 0 disables (default; "
                        "reference parity). Typical: 0.999-0.9999")
    p.add_argument("--remat", type=str2bool, default=False,
                   help="rematerialize backbone blocks on backward "
                        "(jax.checkpoint) for larger per-chip batches")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over N sequential micro-batches "
                        "before each optimizer update (effective batch = "
                        "batch_size, activation memory = one micro-batch)")
    p.add_argument("--fuse_views", type=str2bool, default=False,
                   help="run both views through the backbone as one batch "
                        "during TRAINING too (merges BN batch stats across "
                        "views; eval always fuses)")
    p.add_argument("--weights_only", type=str2bool, default=False,
                   help="load ONLY the weights (params/BN stats, EMA "
                        "preferred) from --ckpt_resume, discarding its "
                        "optimizer state and step — a fine-tune warm start "
                        "from a FULL .msgpack checkpoint (torch .pth.tar "
                        "loads are always weight-only)")
    p.add_argument("--auto_resume_dir", type=str, default=None,
                   help="resume from the newest .msgpack checkpoint in this "
                        "directory (preemption recovery)")
    p.add_argument("--keep_last_n", type=int, default=0,
                   help="retain only the newest N checkpoints (0 = keep all)")
    p.add_argument("--export_torch", type=str, default=None,
                   help="after the run, export params as a reference-format "
                        ".pth.tar (loads in the reference with strict=True)")
    p.add_argument("--dp", type=str2bool, default=True,
                   help="data-parallel training over ALL visible chips "
                        "(jax.sharding Mesh; multi-host via jax.distributed). "
                        "batch_size is the GLOBAL batch. False = single device")
    p.add_argument("--spatial_partition", type=int, default=1,
                   help="additionally shard each image's HEIGHT axis over "
                        "groups of N consecutive chips (GSPMD halo exchange "
                        "between conv shards). Data parallelism then runs "
                        "over device_count/N groups. For per-chip batches "
                        "< 1 sample or activations too large for HBM; plain "
                        "DP (N=1) is faster whenever it fits")
    p.add_argument("--pairing", type=str, default="reference",
                   choices=["reference", "rng"],
                   help="stereo pair-index mode: 'reference' reproduces the "
                        "reference's frozen pairing bit-for-bit (global "
                        "Mersenne-Twister, train dataset drawn before test — "
                        "the eval protocol the released checkpoints are "
                        "measured over); 'rng' uses an independent seeded "
                        "numpy generator")
    p.add_argument("--test_breakdown", type=str2bool, default=False,
                   help="in test mode, also report per-camera and "
                        "per-subject error (appended to test_results.txt)")
    p.add_argument("--xla_compiler_options", type=str, default=None,
                   help="JSON dict of XLA compiler options compiled into the "
                        "train step (e.g. '{\"xla_tpu_autotune_dots\": "
                        "\"true\"}'). Per-executable options are the only "
                        "way to reach xla_tpu_* flags through a tunneled "
                        "backend (the local client's XLA_FLAGS parser "
                        "rejects names only the remote compiler defines). "
                        "See docs/PERF.md for the measured r3 sweep")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture one jax.profiler device trace of N "
                        "steady-state train steps (step 0's compile is "
                        "skipped; both edges are block_until_ready-fenced) "
                        "into --profile_dir")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="profiler trace output dir (default "
                        "<output_dir>/<timestamp>/profile; per-host subdirs "
                        "under multi-host). View in TensorBoard's profile "
                        "plugin or Perfetto")
    return p


def _load_subjects(name: str) -> list:
    path = osp.join(PROJ_DIR, "configs", "subject", f"{name}.yaml")
    with open(path) as f:
        return yaml.safe_load(f)["subject"]


def _load_data_paths(override: Optional[str]) -> dict:
    path = override or osp.join(PROJ_DIR, "data_path.yaml")
    with open(path) as f:
        return yaml.safe_load(f)


def configure_dataset(
    exp_name: str,
    data_paths: dict,
    seed: int = 0,
    pairing: str = "reference",
    n_views: int = 2,
) -> Tuple["GazeDataset", "GazeDataset"]:  # noqa: F821
    """exp_name -> (train_dataset, test_dataset); exact mapping of
    /root/reference/main.py:121-209.

    With ``pairing="reference"`` the two datasets share one
    ``random.Random(seed)`` drawn train-first — the reference's exact
    construction order (main.py:216 seeds, :224 builds train then test), so
    both frozen pair indices match the reference bit-for-bit.

    ``n_views > 2`` builds ``MultiViewGazeDataset`` pairs instead
    (framework-added; the reference protocol has no V-view counterpart, so
    ``pairing`` does not apply there — the V-view index is its own seeded
    draw, data/pairing.py build_multiview_index).
    """
    import random as stdlib_random

    from rot_mvgaze_tpu.data import GazeDataset, MultiViewGazeDataset

    pair_rng = stdlib_random.Random(seed) if pairing == "reference" else None

    parts = exp_name.split("_")
    if len(parts) != 2:
        # e.g. a bare "xgaze": fail with the same error class as any other
        # malformed name instead of an IndexError on parts[1]
        raise NotImplementedError(exp_name)
    dataset_setting, headpose_setting = parts
    if headpose_setting == "known":
        cam_train, cam_test = "all", "all"
    elif headpose_setting == "novel":
        cam_train, cam_test = "novel_train", "novel_test"
    else:
        raise NotImplementedError(exp_name)

    specs = {
        "xgaze2mpiinv": (("xgaze", "bgr"), ("mpiinv", "rgb")),
        "mpiinv2xgaze": (("mpiinv", "rgb"), ("xgaze", "bgr")),
        "xgaze": (("xgaze", "bgr"), ("xgaze", "bgr")),
        "mpiinv": (("mpiinv", "rgb"), ("mpiinv", "rgb")),
    }
    if dataset_setting not in specs:
        raise NotImplementedError(exp_name)
    (train_name, train_color), (test_name, test_color) = specs[dataset_setting]

    if n_views > 2:
        train_dataset = MultiViewGazeDataset(
            dataset_name=train_name,
            dataset_path=data_paths[train_name],
            color_type=train_color,
            keys_to_use=_load_subjects(train_name),
            n_views=n_views,
            camera_tag=cam_train,
            seed=seed,
        )
        test_dataset = MultiViewGazeDataset(
            dataset_name=test_name,
            dataset_path=data_paths[test_name],
            color_type=test_color,
            keys_to_use=_load_subjects(test_name),
            n_views=n_views,
            camera_tag=cam_test,
            seed=seed,
        )
        return train_dataset, test_dataset

    train_dataset = GazeDataset(
        dataset_name=train_name,
        dataset_path=data_paths[train_name],
        color_type=train_color,
        keys_to_use=_load_subjects(train_name),
        camera_tag=cam_train,
        stereo=True,
        seed=seed,
        pairing=pairing,
        pair_rng=pair_rng,
    )
    test_dataset = GazeDataset(
        dataset_name=test_name,
        dataset_path=data_paths[test_name],
        color_type=test_color,
        keys_to_use=_load_subjects(test_name),
        camera_tag=cam_test,
        stereo=True,
        seed=seed,
        pairing=pairing,
        pair_rng=pair_rng,
    )
    return train_dataset, test_dataset


def build_experiment(config: SimpleNamespace):
    """Wire datasets, model, loss, trainer (parity:
    /root/reference/main.py:210-248), plus the scale-out surface the
    reference lacks (single device only, /root/reference/main.py:212):
    a 1-D data-parallel mesh over every visible chip, multi-host via
    jax.distributed, per-host input sharding."""
    # jax.distributed must initialize before the first device use.
    from rot_mvgaze_tpu.parallel import distributed

    if getattr(config, "dp", True):
        distributed.initialize()

    import jax
    import jax.numpy as jnp

    from rot_mvgaze_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    if jax.process_count() > 1:
        # One canonical run directory: main() timestamps output_dir with the
        # host-local wall clock, and startup skew across hosts would split
        # one run into N directories (no single resume dir, duplicated
        # logs). Adopt process 0's path everywhere.
        import numpy as _np
        from jax.experimental import multihost_utils

        raw = str(getattr(config, "output_dir", "./logs")).encode()[:4096]
        enc = _np.frombuffer(raw.ljust(4096, b"\0"), _np.uint8)
        enc = multihost_utils.broadcast_one_to_all(enc)
        config.output_dir = bytes(bytearray(enc)).rstrip(b"\0").decode()

    from rot_mvgaze_tpu.data import BatchLoader
    from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
    from rot_mvgaze_tpu.models import FeatRotationSymm
    from rot_mvgaze_tpu.train import Trainer
    from rot_mvgaze_tpu.utils import set_seed

    mesh = None
    n_procs = jax.process_count()
    ga = max(int(getattr(config, "grad_accum", 1) or 1), 1)
    sp = max(int(getattr(config, "spatial_partition", 1) or 1), 1)
    nv = int(getattr(config, "num_views", 2) or 2)
    if nv < 2:
        # clamping silently would build the stereo stack while the Trainer
        # logs throughput with the literal (wrong) view count
        raise SystemExit(f"--num_views must be >= 2, got {nv}")
    if nv > 2:
        # V-view mode composes with DP/multi-host/freeze_bn/remat; the
        # stereo-only options below would be silently inert or wrong —
        # refuse loudly (same policy as the model's unconstructible combos)
        unsupported = [
            ("--grad_accum > 1", ga > 1),
            ("--spatial_partition > 1", sp > 1),
            ("--encode_rotmat", getattr(config, "encode_rotmat", False)),
            ("--share_feature", getattr(config, "share_feature", False)),
            ("--use_pallas_fusion",
             getattr(config, "use_pallas_fusion", False)),
            ("--use_pallas_bn", bool(getattr(config, "use_pallas_bn",
                                             False))),
            ("--bn_stat_subsample > 1",
             int(getattr(config, "bn_stat_subsample", 1) or 1) > 1),
            ("--fuse_views", getattr(config, "fuse_views", False)),
            # the V-view index is its own seeded draw; the reference's
            # frozen stereo pairing has no V>2 counterpart to replay
            ("--pairing rng",
             getattr(config, "pairing", "reference") != "reference"),
        ]
        bad = [flag for flag, on in unsupported if on]
        if bad:
            raise SystemExit(
                f"--num_views {nv} does not support: {', '.join(bad)}"
            )
    if getattr(config, "freeze_bn", False):
        # freeze_bn normalizes with RUNNING stats (train=False apply), so
        # every train-mode-BN knob below never executes — refuse instead of
        # letting a bench/train run attribute results to a path that did
        # not run (same policy as the model's unconstructible combos)
        inert = [
            ("--use_pallas_bn", bool(getattr(config, "use_pallas_bn",
                                             False))),
            ("--bn_stat_subsample > 1",
             int(getattr(config, "bn_stat_subsample", 1) or 1) > 1),
            ("--fuse_views", getattr(config, "fuse_views", False)),
        ]
        bad = [flag for flag, on in inert if on]
        if bad:
            raise SystemExit(
                f"--freeze_bn uses running-stat (eval-mode) normalization; "
                f"these train-mode-BN options would be silently inert: "
                f"{', '.join(bad)}"
            )
    if getattr(config, "weights_only", False):
        if not getattr(config, "ckpt_resume", None):
            raise SystemExit(
                "--weights_only needs --ckpt_resume CKPT (it changes how "
                "that checkpoint is loaded)"
            )
        if getattr(config, "auto_resume_dir", None):
            raise SystemExit(
                "--weights_only contradicts --auto_resume_dir: auto-resume "
                "exists to CONTINUE a run (optimizer state + step); a "
                "weight-only warm start discards exactly that"
            )
    ema = float(getattr(config, "ema_decay", 0.0) or 0.0)
    if not 0.0 <= ema < 1.0:
        # Trainer validates too; failing at the parser keeps the error
        # pre-compile and names the flag
        raise SystemExit(f"--ema_decay must be in [0, 1), got {ema}")
    if sp > 1 and not (getattr(config, "dp", True) and jax.device_count() > 1):
        raise SystemExit(
            f"--spatial_partition {sp} needs the mesh path: --dp true and "
            f">1 visible device (have {jax.device_count()})"
        )
    if getattr(config, "dp", True) and jax.device_count() > 1:
        if sp > 1 and config.image_size % sp:
            raise SystemExit(
                f"--spatial_partition {sp} must divide --image_size "
                f"{config.image_size} (even height shards)"
            )
        mesh = distributed.global_mesh(spatial=sp)
        from rot_mvgaze_tpu.parallel.mesh import dp_size

        n_dev = dp_size(mesh)  # rows shard over 'data' only
        # batch must divide over the mesh's DATA axis; with gradient
        # accumulation each of the A micro-batches must too -> n_dev * A
        for attr, div in (
            ("batch_size", n_dev * ga),
            ("test_batch_size", n_dev),
        ):
            bs = getattr(config, attr)
            if bs % div:
                rounded = max(bs // div, 1) * div
                print(f"{attr} {bs} -> {rounded} (multiple of {div})")
                setattr(config, attr, rounded)
        print(
            f"data-parallel mesh: {mesh.devices.size} devices across "
            f"{n_procs} host(s)"
            + (f", spatial partition {sp} (dp {n_dev})" if sp > 1 else "")
            + f"; global batch {config.batch_size}"
        )
    elif ga > 1 and config.batch_size % ga:
        rounded = max(config.batch_size // ga, 1) * ga
        print(f"batch_size {config.batch_size} -> {rounded} "
              f"(multiple of grad_accum={ga})")
        config.batch_size = rounded
    # Per-host slice of the global batch; loaders read only this host's shard.
    process_shard = (jax.process_index(), n_procs) if n_procs > 1 else None
    local_bs = config.batch_size // n_procs
    local_test_bs = config.test_batch_size // n_procs

    set_seed(config.seed)
    data_paths = _load_data_paths(config.data_path)
    train_dataset, test_dataset = configure_dataset(
        config.exp_name, data_paths, seed=config.seed,
        pairing=getattr(config, "pairing", "reference"),
        n_views=nv,
    )

    train_loader = test_loader = None
    if nv > 2 and getattr(config, "native_loader", True):
        # the packed cache stores stereo pair rows; V-view batches come
        # from the h5py thread loader (the stacked reads are few and big)
        print("V-view mode: using the h5py loader (packed cache is stereo)")
    elif getattr(config, "native_loader", True):
        try:
            from rot_mvgaze_tpu.data.native import (
                NativeBatchLoader,
                NativePool,
                PackedGazeDataset,
            )

            if NativePool.available():
                # pair_index from the h5 datasets: native and h5 paths are
                # guaranteed to serve the identical frozen pairing
                nat_train = PackedGazeDataset(
                    train_dataset.dataset_name,
                    osp.dirname(train_dataset.file_paths[0]),
                    train_dataset.color_type,
                    [osp.basename(p) for p in train_dataset.file_paths],
                    camera_tag=train_dataset.camera_tag,
                    seed=config.seed,
                    pair_index=train_dataset.idx_to_kv,
                )
                nat_test = PackedGazeDataset(
                    test_dataset.dataset_name,
                    osp.dirname(test_dataset.file_paths[0]),
                    test_dataset.color_type,
                    [osp.basename(p) for p in test_dataset.file_paths],
                    camera_tag=test_dataset.camera_tag,
                    seed=config.seed,
                    pair_index=test_dataset.idx_to_kv,
                )
                # assign BOTH only after both construct: a failure on either
                # side must fall back to the h5py loaders as a pair
                nat_train_loader = NativeBatchLoader(
                    nat_train, local_bs, shuffle=True,
                    seed=config.seed, drop_last=True,
                    process_shard=process_shard,
                )
                nat_test_loader = NativeBatchLoader(
                    nat_test, local_test_bs, process_shard=process_shard
                )
                train_loader, test_loader = nat_train_loader, nat_test_loader
                print("using native packed-cache loader")
        except Exception as e:  # fall back to the h5py thread loader
            train_loader = test_loader = None
            print(f"native loader unavailable ({e}); using h5py loader")
    if train_loader is None:
        train_loader = BatchLoader(
            train_dataset,
            batch_size=local_bs,
            shuffle=True,
            seed=config.seed,
            drop_last=True,
            num_threads=config.num_workers,
            process_shard=process_shard,
        )
        test_loader = BatchLoader(
            test_dataset,
            batch_size=local_test_bs,
            shuffle=False,
            num_threads=config.num_workers,
            process_shard=process_shard,
        )

    if nv > 2:
        from rot_mvgaze_tpu.losses import MultiViewL1Loss
        from rot_mvgaze_tpu.models import FeatRotationMultiView

        model = FeatRotationMultiView(
            backbone_depth=config.backbone_depth,
            num_iter=config.num_iter,
            share_weights=config.share_weights,
            ignore_rotmat=config.ignore_rotmat,
            dtype=jnp.bfloat16 if config.bf16 else jnp.float32,
            remat=getattr(config, "remat", False),
        )
        # same scale as the stereo stack: view 0 weighted 1.0, every
        # partner view reference_decay (reduces exactly to StereoL1Loss
        # at V=2 — losses/multiview.py)
        metrics = IterationLoss(
            loss=MultiViewL1Loss(rel_weight=0.01, reference_decay=1.0),
            iter_decay=0.5,
        )
        return Trainer(
            config=config,
            model=model,
            metrics=metrics,
            train_loader=train_loader,
            test_loader=test_loader,
            mesh=mesh,
        )

    model = FeatRotationSymm(
        backbone_depth=config.backbone_depth,
        num_iter=config.num_iter,
        share_weights=config.share_weights,
        encode_rotmat=config.encode_rotmat,
        share_feature=config.share_feature,
        ignore_rotmat=config.ignore_rotmat,
        dtype=jnp.bfloat16 if config.bf16 else jnp.float32,
        use_pallas_fusion=getattr(config, "use_pallas_fusion", False),
        use_pallas_bn=getattr(config, "use_pallas_bn", False),
        bn_stat_subsample=getattr(config, "bn_stat_subsample", 1),
        remat=getattr(config, "remat", False),
        fuse_views=getattr(config, "fuse_views", False),
    )
    # Shipped loss stack (/root/reference/main.py:239-240).
    metrics = IterationLoss(
        loss=StereoL1Loss(
            rel_weight=0.01, reference_decay=1.0, distance_metric="angular_error"
        ),
        iter_decay=0.5,
    )
    trainer = Trainer(
        config=config,
        model=model,
        metrics=metrics,
        train_loader=train_loader,
        test_loader=test_loader,
        mesh=mesh,
    )
    return trainer


def main(argv=None) -> int:
    parser = get_parser()
    args, _unknown = parser.parse_known_args(argv)
    if _unknown:
        # tolerated for reference-CLI compatibility, but NEVER silently: a
        # misspelled hyperparameter must not train a long run at defaults
        print(f"WARNING: ignoring unrecognized arguments: {_unknown}",
              file=sys.stderr)

    now_day = datetime.datetime.now().strftime("%Y-%m-%d")
    now_time = datetime.datetime.now().strftime("%H-%M-%S")
    args.output_dir = osp.join(args.output_dir, now_day, now_time)
    config = SimpleNamespace(**vars(args))

    if not args.exp_name:
        parser.error("--exp_name is required (e.g. xgaze2mpiinv_known)")
    # Validate BEFORE build_experiment: these used to fire after the full
    # (expensive) dataset-pack and model build. The Trainer resolves
    # --auto_resume_dir to the newest checkpoint itself, so test mode needs
    # EITHER checkpoint source — not ckpt_resume alone.
    if config.mode == "test" and not (
        config.ckpt_resume or getattr(config, "auto_resume_dir", None)
    ):
        parser.error(
            "--mode test requires --ckpt_resume CKPT (or --auto_resume_dir DIR)"
        )
    if getattr(config, "profile_dir", None) and not getattr(
        config, "profile_steps", 0
    ):
        # otherwise the run finishes with an empty trace dir and no hint
        parser.error("--profile_dir requires --profile_steps N (how many "
                     "steady-state train steps to trace)")

    trainer = build_experiment(config)
    if config.mode == "train":
        trainer.train()
    else:
        trainer.test(-1)
        if getattr(config, "test_breakdown", False):
            trainer.test_breakdown()
    if getattr(config, "export_torch", None):
        path = trainer.export_torch_checkpoint(config.export_torch)
        print(f"exported reference-format checkpoint: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
