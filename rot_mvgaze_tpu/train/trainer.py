"""Training/evaluation runtime (parity target: /root/reference/trainer.py).

TPU-first redesign of the reference Trainer:

- ONE jitted train step containing augmentation, head-pose->SO(3), forward,
  loss, backward, Adam update — the host only feeds uint8 batches.
- Optimizer: Adam(lr from cyclic-triangular2 schedule, torch-style coupled
  weight_decay=1e-6) matching /root/reference/trainer.py:54-62, including the
  per-EPOCH scheduler stepping quirk (:147) via ``steps_per_epoch`` in the
  schedule (set ``config.scheduler_step='iteration'`` for the sane variant).
- Eval: jitted forward; the headline metric (mean angular error, degrees) is
  computed host-side in float64 exactly like /root/reference/trainer.py:169-192.
- Checkpoints: single-file msgpack (params + batch_stats + opt_state + step
  — the reference saves params only and restarts its schedule on resume,
  /root/reference/trainer.py:150-160); full-state resume, auto-resume from a
  directory, and preemption-safe SIGTERM saves. Torch ``.pth.tar``
  checkpoints are auto-detected on resume and converted via
  rot_mvgaze_tpu.compat; Orbax directory format available for multi-host.
- Data parallel: pass a ``Mesh``; batches are batch-sharded, params
  replicated; XLA inserts gradient all-reduce + global-batch BN collectives.
- Observability: dependency-free TensorBoard writer (scalars + image grids),
  ``test_results.txt``, config snapshot — same surface as the reference
  (/root/reference/trainer.py:70-80,130-139,194-198).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rot_mvgaze_tpu.data.pipeline import device_prefetch
from rot_mvgaze_tpu.geometry import angular_error_numpy
from rot_mvgaze_tpu.train.schedule import cyclic_triangular2
from rot_mvgaze_tpu.train.tb import SummaryWriter, make_image_grid
from rot_mvgaze_tpu.utils.summary import count_parameters, parameter_table


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # Exponential moving average of ``params`` (``--ema_decay``, a
    # framework-added option — the reference has none). None when disabled:
    # None is an empty pytree node, so the default costs nothing and keeps
    # every existing construction site/checkpoint layout valid.
    ema_params: Any = None


def make_optimizer(
    schedule, weight_decay: float = 1e-6
) -> optax.GradientTransformation:
    """torch.optim.Adam(lr=schedule, weight_decay=wd) equivalent: coupled L2
    (decay added to the gradient BEFORE the Adam moments), matching
    /root/reference/trainer.py:54."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )


class Trainer:
    """Drives training/eval of a FeatRotationSymm-style dict model.

    ``config`` needs: output_dir, batch_size, test_batch_size, epochs,
    save_epoch, print_freq, seed, ckpt_resume, image_size (224),
    scheduler_step ('epoch' reference-parity | 'iteration').
    """

    def __init__(
        self,
        config: Any,
        model: Any,
        metrics: Any,
        train_loader: Optional[Iterable] = None,
        test_loader: Optional[Iterable] = None,
        mesh: Optional[Any] = None,
        init_variables: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.config = config
        self.model = model
        self.metrics = metrics
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.mesh = mesh
        self.image_size = int(getattr(config, "image_size", 224))
        # V-view mode (framework-added, models.multiview): >2 switches the
        # jitted steps and init shapes to the stacked (B, V, ...) contract.
        self._num_views = int(getattr(config, "num_views", 2) or 2)
        # Parameter EMA (--ema_decay, framework-added; see steps.update_ema).
        # 0 disables. Typical fine-tune values: 0.999-0.9999.
        self._ema_decay = float(getattr(config, "ema_decay", 0.0) or 0.0)
        if not 0.0 <= self._ema_decay < 1.0:
            raise ValueError(
                f"--ema_decay must be in [0, 1), got {self._ema_decay}"
            )

        self.root_key = jax.random.PRNGKey(int(getattr(config, "seed", 0)))

        # ---- variables ----
        ckpt_resume = getattr(config, "ckpt_resume", None)
        auto_dir = getattr(config, "auto_resume_dir", None)
        if ckpt_resume is None and auto_dir:
            from rot_mvgaze_tpu.train.checkpoints import find_latest_checkpoint

            ckpt_resume = find_latest_checkpoint(auto_dir)
            if ckpt_resume:
                print(f"auto-resume from latest checkpoint: {ckpt_resume}")
        if (
            getattr(config, "mode", "train") == "test"
            and ckpt_resume is None
            and init_variables is None
        ):
            # Test mode with no resolvable checkpoint AND no explicitly
            # supplied weights would silently score freshly-initialized
            # weights — refuse loudly instead (the reference fails the same
            # way: strict load of a required --ckpt_resume,
            # /root/reference/main.py:253-255). Programmatic callers that
            # pass init_variables made a deliberate choice of weights.
            raise FileNotFoundError(
                "--mode test needs a checkpoint, but none was found: "
                f"ckpt_resume={getattr(config, 'ckpt_resume', None)!r}, "
                f"auto_resume_dir={auto_dir!r} contains no *.msgpack"
            )
        self._resume_path = ckpt_resume
        # --weights_only: treat ANY checkpoint as a bare weight source
        # (fine-tune warm start); the full-state resume below is skipped
        # and _load_checkpoint_variables prefers the EMA tree if present
        self._weights_only = bool(getattr(config, "weights_only", False))
        if self._weights_only and auto_dir:
            # Guard at the MECHANISM, not only the CLI (programmatic
            # callers build Trainer directly): auto-resume exists to
            # CONTINUE a preempted run; weights_only would silently drop
            # its optimizer state + step every restart — an infinite
            # from-scratch loop that prints "auto-resume".
            raise ValueError(
                "weights_only contradicts auto_resume_dir: auto-resume "
                "continues a run (optimizer state + step); a weight-only "
                "warm start discards exactly that"
            )
        # Explicit weights of any provenance count as a warm start (used by
        # the --freeze_bn cold-init warning below).
        self._warm_start = (
            ckpt_resume is not None
            or init_variables is not None
            or bool(getattr(config, "pretrained_backbone", None))
        )
        if init_variables is None:
            init_variables = self._init_variables()
        pretrained_backbone = getattr(config, "pretrained_backbone", None)
        if pretrained_backbone:
            from rot_mvgaze_tpu.compat import load_pretrained_backbone
            from rot_mvgaze_tpu.compat.download import (
                resolve_pretrained_backbone,
            )

            # 'auto'/'download' fetches from MODEL_URLS with checksum
            # verification — the reference's one-command ImageNet bootstrap
            # (/root/reference/models/resnet.py:278-283)
            pretrained_backbone = resolve_pretrained_backbone(
                pretrained_backbone, self.model.backbone_depth
            )
            init_variables = jax.tree.map(
                jnp.asarray,
                load_pretrained_backbone(
                    jax.device_get(init_variables),
                    pretrained_backbone,
                    self.model.backbone_depth,
                ),
            )
            print(f"backbone initialized from {pretrained_backbone}")
        if ckpt_resume:
            init_variables = self._load_checkpoint_variables(
                ckpt_resume, init_variables
            )

        # ---- optimizer ----
        # num_samples() accounts for per-host input sharding (multi-host DP):
        # steps/epoch = local samples / local batch = global / global.
        if train_loader is None:
            n_train = 0
        elif hasattr(train_loader, "num_samples"):
            n_train = train_loader.num_samples()
        else:
            n_train = len(train_loader.dataset)
        batch_size = int(getattr(train_loader, "batch_size", None)
                         or getattr(config, "batch_size", 50))
        if train_loader is not None and hasattr(type(train_loader), "__len__"):
            # len() accounts for drop_last (the reference sizes the cycle
            # from len(train_loader) too, /root/reference/trainer.py:56-58).
            # With a non-drop_last loader an epoch runs ceil(n/bs) optimizer
            # steps; deriving steps_per_epoch as floor(n/bs) would let the
            # 'epoch'-mode schedule position (step // steps_per_epoch) drift
            # ahead of the reference's once-per-epoch CyclicLR.step().
            steps_per_epoch = max(len(train_loader), 1)
        else:
            steps_per_epoch = max(n_train // batch_size, 1)
        self.steps_per_epoch = steps_per_epoch
        step_size_up = max(steps_per_epoch // 2, 1)
        step_size_down = max(steps_per_epoch - step_size_up, 1)
        scheduler_step = getattr(config, "scheduler_step", "epoch")
        self.schedule = cyclic_triangular2(
            base_lr=float(getattr(config, "base_lr", 1e-6)),
            max_lr=float(getattr(config, "max_lr", 1e-3)),
            step_size_up=step_size_up,
            step_size_down=step_size_down,
            # 'epoch': advance schedule position once per epoch (reference
            # quirk, /root/reference/trainer.py:56-58 vs :147).
            steps_per_epoch=steps_per_epoch if scheduler_step == "epoch" else 1,
        )
        self.tx = make_optimizer(
            self.schedule, float(getattr(config, "weight_decay", 1e-6))
        )

        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=init_variables["params"],
            batch_stats=init_variables.get("batch_stats", {}),
            opt_state=self.tx.init(init_variables["params"]),
        )
        if self._ema_decay > 0:
            # Seed the EMA at the starting weights (no bias correction
            # needed). MUST be distinct buffers, not aliases: the train
            # step donates the whole state, and donating the same buffer
            # through both the params and ema_params leaves is a runtime
            # error ("attempt to donate the same buffer twice").
            self.state = self.state.replace(
                ema_params=jax.tree.map(jnp.copy, self.state.params)
            )
        # Full-state resume (optimizer moments + step) when the checkpoint
        # carries them — subsumes the reference's params-only restart
        # (/root/reference/trainer.py:45-48 drops optimizer/schedule state).
        # Gate on tree CONTENTS, not the filename: a full TrainState
        # checkpoint saved/renamed with a non-.msgpack extension must take
        # this path too, or --mode test would silently score the raw params
        # (prefer_ema above keys off "opt_state" in tree for the same
        # reason — the two decisions must agree). --weights_only opts OUT:
        # a fine-tune warm start keeps only params/BN stats (EMA preferred)
        # and takes the fresh optimizer + full epoch budget, the same
        # semantics a torch .pth.tar init gets.
        if (
            self._resume_path
            and not self._weights_only
            and not self._resume_path.endswith((".pth", ".pth.tar", ".pt"))
        ):
            from rot_mvgaze_tpu.train.checkpoints import (
                restore_state_from_tree,
                restore_tree,
            )

            # parsed once in _load_checkpoint_variables; fall back to a
            # fresh read only if that path was skipped
            tree = getattr(self, "_resume_tree", None)
            if tree is None:
                tree = restore_tree(self._resume_path)
            # epoch position metadata (epochs_done/epoch_step/steps_per_
            # epoch), written by save_checkpoint since r4 — popped before
            # from_state_dict, which rejects keys the TrainState lacks.
            # Absent in older checkpoints (legacy floor fallback below).
            self._resume_meta = (
                tree.pop("epoch_meta", None) if isinstance(tree, dict) else None
            )
            if "opt_state" in tree:
                # EMA key normalization: from_state_dict requires the key.
                # Older checkpoints lack it; newer ones carry the EMA tree
                # (or None). A TRAINING resume with --ema_decay 0 drops a
                # stored EMA loudly (it would go stale, yet eval prefers
                # it); test mode keeps it — the EMA weights are the
                # deployment weights.
                has_ema = tree.get("ema_params") is not None
                training = getattr(config, "mode", "train") == "train"
                if self._ema_decay > 0 and not has_ema:
                    print(
                        "checkpoint has no EMA weights; seeding the EMA "
                        "from its params",
                        flush=True,
                    )
                    # deep copy, not an alias: zero-copy numpy->device
                    # transfers could otherwise hand the donated train step
                    # the same buffer through both leaves (see __init__)
                    tree["ema_params"] = jax.tree.map(
                        np.copy, tree["params"]
                    )
                elif has_ema and self._ema_decay == 0 and training:
                    print(
                        "WARNING: checkpoint carries EMA weights but "
                        "--ema_decay is 0; dropping them for this training "
                        "run (pass --ema_decay to keep updating the "
                        "average)",
                        flush=True,
                    )
                    tree["ema_params"] = None
                else:
                    tree.setdefault("ema_params", None)
                self.state = restore_state_from_tree(tree, self.state)
                print(
                    f"restored full training state at step {int(self.state.step)}"
                )
            self._resume_tree = None  # free inside the branch too: the
            # broadcast below must not hold a second multi-GB copy alive
        # every load path is done with the parsed tree here (weight-only
        # warm starts, torch loads, bare-variable msgpacks) — one
        # unconditional clear so no future path can leak a full R50
        # TrainState for the Trainer's lifetime
        self._resume_tree = None
        if jax.process_count() > 1:
            # Hosts must start bitwise-identical: DP collectives average
            # GRADIENTS, never parameters, so a resume where only some hosts
            # see the checkpoint (checkpoints are written by process 0 only;
            # filesystems may not be shared) would silently diverge forever.
            # One-time broadcast of the whole state from process 0.
            from jax.experimental import multihost_utils

            self.state = multihost_utils.broadcast_one_to_all(self.state)
            # The epoch-position metadata lives in the same process-0-only
            # checkpoint file — broadcast it too, or hosts without the file
            # would derive a different start epoch than process 0.
            m = getattr(self, "_resume_meta", None) or {}
            marr = multihost_utils.broadcast_one_to_all(
                np.asarray(
                    [
                        1 if getattr(self, "_resume_meta", None) else 0,
                        int(m.get("epochs_done", 0)),
                        int(m.get("epoch_step", 0)),
                        int(m.get("steps_per_epoch", 0)),
                    ],
                    np.int64,
                )
            )
            self._resume_meta = (
                {
                    "epochs_done": int(marr[1]),
                    "epoch_step": int(marr[2]),
                    "steps_per_epoch": int(marr[3]),
                }
                if int(marr[0])
                else None
            )
        if self.mesh is not None:
            from rot_mvgaze_tpu.parallel.mesh import replicated_sharding

            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))

        # ---- output dirs / logging ----
        # State is replicated across hosts, so file outputs (TB events,
        # checkpoints, test_results.txt, config snapshot) are written by
        # process 0 only — N identical copies at best, same-file collisions
        # on a shared filesystem at worst.
        self._is_primary = jax.process_index() == 0
        self.output_dir = getattr(config, "output_dir", "./logs")
        os.makedirs(self.output_dir, exist_ok=True)
        self.ckpt_dir = osp.join(self.output_dir, "ckpt")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if self._is_primary:
            self.writer = SummaryWriter(osp.join(self.output_dir, "tensorboard"))
            # config snapshot (reference: OmegaConf.save -> config.yaml,
            # /root/reference/trainer.py:70)
            import yaml

            with open(osp.join(self.output_dir, "config.yaml"), "w") as f:
                yaml.safe_dump(
                    {k: v for k, v in vars(config).items() if _jsonable(v)}, f
                )
        else:
            from rot_mvgaze_tpu.train.tb import NullSummaryWriter

            self.writer = NullSummaryWriter()

        self.epochs = int(getattr(config, "epochs", 15))
        self.save_epoch = int(getattr(config, "save_epoch", 10))
        self.print_freq = int(getattr(config, "print_freq", 50))
        # ---- profiler capture (--profile_steps; SURVEY §5 tracing) ----
        # One jax.profiler device trace of N STEADY-STATE train steps:
        # started at the second step of the first epoch (step 0 pays the
        # compile — tracing it would bury the device timeline under one
        # giant XlaCompile block), block_until_ready-fenced on both edges so
        # the window holds exactly the profiled steps' device work.
        self.profile_steps = int(getattr(config, "profile_steps", 0) or 0)
        profile_dir = getattr(config, "profile_dir", None)
        if self.profile_steps and profile_dir is None:
            profile_dir = osp.join(self.output_dir, "profile")
        if profile_dir is not None and jax.process_count() > 1:
            # per-host trace dirs: hosts profile their local devices; a
            # shared dir would interleave event files on a common fs
            profile_dir = osp.join(
                profile_dir, f"host_{jax.process_index():02d}"
            )
        self._profile_dir = profile_dir
        self._profiled = False
        self._profile_active = False
        self._profile_left = 0
        # Resume-aware: TB train scalars are logged at train_iter, so a
        # full-state resume must continue the x-axis at the restored step —
        # restarting at 0 re-emits steps 0..N into the same tensorboard dir
        # and zig-zags every training curve of the preemption-resume flow.
        self.train_iter = int(self.state.step)
        # Epoch-resume: a preemption restart must run only the REMAINING
        # epochs, not self.epochs more (the reference cannot resume at all;
        # its --ckpt_resume restarts the epoch count,
        # /root/reference/main.py:251-257). Checkpoints carry explicit
        # epoch-position metadata (epochs_done, epoch_step, steps_per_epoch
        # — save_checkpoint), so the resume is STEP-EXACT: the interrupted
        # epoch fast-forwards past its already-consumed batches instead of
        # re-running them, keeping state.step, the data stream, and the
        # 'epoch'-mode LR schedule position identical to an uninterrupted
        # run. Legacy checkpoints without the metadata fall back to
        # step // steps_per_epoch (exact only for epoch-boundary saves; a
        # mid-epoch legacy save re-runs that epoch). Torch checkpoints
        # carry no step, so weight-only fine-tune inits keep the full
        # epoch budget. Both derivations are pure functions of broadcast
        # state → identical on every host.
        self._start_epoch = 0
        self._start_batch = 0
        meta = getattr(self, "_resume_meta", None)
        if meta is not None:
            self._start_epoch = min(int(meta["epochs_done"]), self.epochs)
            self._start_batch = max(int(meta["epoch_step"]), 0)
            if self._start_batch and int(meta["steps_per_epoch"]) != self.steps_per_epoch:
                # A different batch size / host count rebatches the epoch
                # permutation — the saved batch position is meaningless
                # there. epochs_done stays exact (it counts epochs, not
                # steps); the interrupted epoch restarts from its first
                # batch (its partial steps stay in the optimizer, shifting
                # the 'epoch'-mode LR boundary once — unavoidable when the
                # batching itself changed).
                print(
                    "resume: steps_per_epoch changed "
                    f"({int(meta['steps_per_epoch'])} at save time vs "
                    f"{self.steps_per_epoch} now) — the interrupted epoch "
                    "restarts from its first batch"
                )
                self._start_batch = 0
            if self._start_epoch >= self.epochs:
                self._start_batch = 0
        elif self.train_iter > 0 and self.steps_per_epoch > 0:
            self._start_epoch = min(
                self.train_iter // self.steps_per_epoch, self.epochs
            )
        if self._start_epoch > 0 and self.train_loader is not None:
            # Continue the original run's per-epoch shuffle sequence: both
            # loaders draw order from rng((seed, epoch)) with a process-
            # local counter that restarts at 0 — without this sync a
            # resumed epoch 7 would replay epoch 0's permutation.
            self.train_loader.epoch = self._start_epoch
        # Epoch position the NEXT save_checkpoint records: (epochs fully
        # done, optimizer steps taken inside the in-progress epoch).
        self._epoch_cur = self._start_epoch
        self._epoch_step = self._start_batch
        # process-level executed-train-step counter (profiler trigger: the
        # first executed step pays the compile, steady state starts at the
        # second — regardless of epoch boundaries, so single-batch epochs
        # still get traced)
        self._exec_steps = 0

        print(parameter_table(self.state.params))
        print(f"total params: {count_parameters(self.state.params):,}")

        # ---- jitted steps ----
        from rot_mvgaze_tpu.train.steps import make_eval_step, make_train_step

        freeze_bn = bool(getattr(config, "freeze_bn", False))
        if freeze_bn and not self._warm_start:
            # Frozen BN normalizes with the checkpoint's running statistics;
            # from a cold init those are the (0, 1) defaults, so every BN is
            # a no-op affine and training quality suffers silently. Warn,
            # don't refuse: a deliberate cold-start experiment stays legal.
            print(
                "WARNING: --freeze_bn without --pretrained_backbone/"
                "--ckpt_resume freezes BatchNorm at its init statistics "
                "(mean=0, var=1); intended for fine-tuning warm starts",
                flush=True,
            )
        grad_accum = int(getattr(config, "grad_accum", 1) or 1)
        if grad_accum > 1 and train_loader is not None:
            # fail fast: a ragged batch would hit the micro-split reshape at
            # trace time at the END of the first epoch
            lb = int(getattr(train_loader, "batch_size", batch_size))
            if lb % grad_accum:
                raise ValueError(
                    f"batch_size {lb} not divisible by grad_accum {grad_accum}"
                )
            if not getattr(train_loader, "drop_last", False):
                raise ValueError(
                    "grad_accum > 1 requires a drop_last train loader "
                    "(a ragged final batch cannot split into micro-batches)"
                )

        # --xla_compiler_options: JSON dict of per-executable XLA options
        # (the only route to xla_tpu_* flags over a tunneled backend; the
        # r3 sweep in docs/PERF.md measured the candidates). Train step
        # only — the eval graph was not part of the sweep.
        jit_kwargs = {}
        xla_opts = getattr(config, "xla_compiler_options", None)
        if xla_opts:
            import json as _json

            try:
                parsed = (xla_opts if isinstance(xla_opts, dict)
                          else _json.loads(xla_opts))
            except _json.JSONDecodeError as e:
                raise ValueError(
                    f"--xla_compiler_options is not valid JSON: {e}"
                ) from e
            if not isinstance(parsed, dict):
                raise ValueError(
                    "--xla_compiler_options must be a JSON object of "
                    "{option: value}"
                )
            if parsed:
                jit_kwargs["compiler_options"] = parsed

        # On a 2-D (data, spatial) mesh the augmented views are re-pinned
        # to the H-sharded layout inside the step (see make_train_step's
        # image_sharding doc: without the constraint GSPMD silently
        # replicates the spatial axis away).
        img_sharding = None
        if self.mesh is not None:
            from rot_mvgaze_tpu.parallel.mesh import (
                image_sharding as _img_sh,
                spatial_size,
                with_spatial_floor,
            )

            if spatial_size(self.mesh) > 1:
                img_sharding = _img_sh(self.mesh)
                # backbone gathers the height axis once feature maps get
                # too small to shard (ResNet.spatial_unshard); RAISES for a
                # model without the floor — training one spatially sharded
                # risks silently wrong gradients at tiny extents
                self.model = with_spatial_floor(self.model, self.mesh)
        if self._num_views > 2:
            # stacked-(B,V,...) steps; grad_accum/spatial stay stereo-only
            if grad_accum > 1:
                raise ValueError(
                    "--grad_accum > 1 is not supported with --num_views > 2"
                )
            if img_sharding is not None:
                raise ValueError(
                    "--spatial_partition is not supported with "
                    "--num_views > 2"
                )
            from rot_mvgaze_tpu.train.multiview_steps import (
                make_multiview_eval_step,
                make_multiview_train_step,
            )

            self._train_step = jax.jit(
                make_multiview_train_step(
                    self.model,
                    self.metrics,
                    self.tx,
                    image_size=self.image_size,
                    schedule=self.schedule,
                    with_images=True,
                    fold_key_by_step=True,
                    freeze_bn=freeze_bn,
                    ema_decay=self._ema_decay,
                ),
                donate_argnums=(0,),
                **jit_kwargs,
            )
        else:
            self._train_step = jax.jit(
                make_train_step(
                    self.model,
                    self.metrics,
                    self.tx,
                    image_size=self.image_size,
                    schedule=self.schedule,
                    with_images=True,
                    # per-step PRNG key derived on device from state.step —
                    # no per-step host dispatch (costly over a tunnel)
                    fold_key_by_step=True,
                    grad_accum=grad_accum,
                    image_sharding=img_sharding,
                    freeze_bn=freeze_bn,
                    ema_decay=self._ema_decay,
                ),
                donate_argnums=(0,),
                **jit_kwargs,
            )
        # staged once; reused every step (fold happens inside the jit)
        self._base_key = jax.device_put(self.root_key)
        # Eval always runs float32 regardless of the training compute dtype:
        # params are f32 either way, and the headline metric (mean angular
        # error vs the reference checkpoints, BASELINE.md) must not absorb
        # bf16 forward rounding. Training can therefore default to bf16
        # without touching metric parity.
        eval_model = self.model
        if getattr(self.model, "dtype", jnp.float32) != jnp.float32:
            eval_model = self.model.clone(dtype=jnp.float32)
        if self._num_views > 2:
            self._eval_step = jax.jit(
                make_multiview_eval_step(eval_model, self.image_size)
            )
        else:
            self._eval_step = jax.jit(
                make_eval_step(
                    eval_model, self.image_size, image_sharding=img_sharding
                )
            )

    # ------------------------------------------------------------------
    def _init_variables(self) -> Dict[str, Any]:
        s = self.image_size
        if self._num_views > 2:
            V = self._num_views
            dummy = {
                "imgs": jnp.zeros((2, V, s, s, 3), jnp.float32),
                "rots": jnp.broadcast_to(jnp.eye(3), (2, V, 3, 3)),
            }
        else:
            dummy = {
                "img_0": jnp.zeros((2, s, s, 3), jnp.float32),
                "img_1": jnp.zeros((2, s, s, 3), jnp.float32),
                "rot_0": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
                "rot_1": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
            }
        return self.model.init({"params": self.root_key}, dummy, train=False)

    def _load_checkpoint_variables(
        self, path: str, init_variables: Dict[str, Any]
    ) -> Dict[str, Any]:
        print(f"load from ckpt: {path}")
        if path.endswith((".pth", ".pth.tar", ".pt")):
            from rot_mvgaze_tpu.compat import (
                convert_rot_mv_state_dict,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(path)
            from rot_mvgaze_tpu.serving import MODEL_CONFIG_KEYS

            # getattr default False: FeatRotationMultiView lacks the stereo-only
            # ablation fields (encode_rotmat/share_feature) but shares the
            # stereo param tree, so conversion treats them as off
            cfg = {k: getattr(self.model, k, False) for k in MODEL_CONFIG_KEYS}
            converted = convert_rot_mv_state_dict(sd, **cfg)
            return jax.tree.map(jnp.asarray, converted)
        from rot_mvgaze_tpu.train.checkpoints import (
            restore_tree,
            variables_from_tree,
        )

        tree = restore_tree(path)
        # stash the parsed tree so the full-state resume block reuses it
        # instead of re-reading + re-deserializing the file (any msgpack
        # payload, whatever its extension — the resume gate checks tree
        # CONTENTS, not the filename)
        self._resume_tree = tree
        return variables_from_tree(
            tree,
            init_variables,
            source=f"checkpoint at {path}",
            # A full TrainState checkpoint is restored in whole right after
            # this (params AND ema_params, __init__); swapping EMA into the
            # throwaway optimizer-init template here would only print a
            # misleading "using the EMA weights" for a training resume that
            # in fact continues from the raw params. Under --weights_only
            # no full restore follows, so THIS load is the real one and the
            # EMA weights (the deployment weights) are what a fine-tune
            # should start from.
            prefer_ema=self._weights_only or "opt_state" not in tree,
        )

    # ------------------------------------------------------------------
    def train(self) -> float:
        """Full loop: eval before epoch 0, then train/eval per epoch
        (parity: /root/reference/trainer.py:84-96), with preemption-safe
        checkpointing: SIGTERM/SIGINT triggers a final state save at the
        next step boundary instead of losing the run (the reference has no
        failure handling, SURVEY.md §5)."""
        import signal

        self._preempted = False

        def _on_signal(signum, frame):
            print(f"signal {signum}: checkpointing at next step boundary")
            self._preempted = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread
                pass

        try:
            start = self._start_epoch
            if start >= self.epochs and self.epochs > 0:
                print(
                    f"resume: checkpoint already covers {self.epochs} "
                    f"epoch(s) (step {self.train_iter}) — evaluating only"
                )
            elif start > 0 or self._start_batch > 0:
                pos = (
                    f" from batch {self._start_batch + 1}"
                    if self._start_batch > 0
                    else ""
                )
                print(
                    f"resume: {start} epoch(s) done (step {self.train_iter})"
                    f" — training epochs {start + 1}..{self.epochs}{pos}"
                )
            error = self.test(-1)
            for epoch in range(start, self.epochs):
                if self._preempt_agreed():
                    # signal landed during the PREVIOUS epoch's eval (after
                    # its post-epoch check) or the initial eval — exit at
                    # this epoch boundary instead of training one more step
                    # before the in-loop check fires
                    self.save_checkpoint(add=f"preempt_epoch_{epoch:02d}")
                    print("preempted: state saved, exiting train loop")
                    return float("nan")
                self.train_one_epoch(epoch)
                # agreement, not the local flag: a signal landing after the
                # epoch's last in-loop sync must not let one host save+exit
                # while the others enter test()'s collectives
                if self._preempt_agreed():
                    self.save_checkpoint(add=f"preempt_epoch_{epoch:02d}")
                    print("preempted: state saved, exiting train loop")
                    return float("nan")
                error = self.test(epoch)
                if (epoch + 1) % self.save_epoch == 0:
                    self.save_checkpoint(
                        add=f"epoch_{epoch + 1:02d}_error={round(error, 2)}"
                    )
            if self._preempt_agreed():
                # signal during the LAST epoch's eval: the loop is over, so
                # no later boundary check will run — honor the handler's
                # "checkpointing at next step boundary" promise instead of
                # exiting with the printed promise silently dropped (the
                # preempting scheduler may still expect a resumable save
                # even though training completed).
                self.save_checkpoint(add="preempt_final")
                print("preempted during final eval: state saved")
            if self.profile_steps > 0 and not self._profiled:
                # e.g. the whole run executed < 2 train steps: the first
                # step is excluded as compile, so there was no steady state
                # to trace — say so instead of finishing with an absent
                # trace dir and no explanation
                print(
                    "WARNING: --profile_steps was set but no trace was "
                    "captured (the run executed fewer than 2 train steps; "
                    "the first step is excluded as compile)"
                )
            return error
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)

    def train_one_epoch(self, epoch: int) -> None:
        import time

        print(f"Epoch: {epoch + 1} / {self.epochs}")
        assert self.train_loader is not None
        # Pass the MESH: device_prefetch then places each leaf by rank
        # (images shard over 'spatial' too on a 2-D mesh, scalars replicate)
        sharding = self.mesh
        skip = 0
        if epoch == self._start_epoch and self._start_batch > 0:
            # step-exact mid-epoch resume: the checkpointed run already
            # consumed the first `skip` batches of this epoch's permutation
            skip = self._start_batch
            self._start_batch = 0  # one-shot
            self.train_loader.skip_batches = skip
            print(
                f"resume: fast-forwarding epoch {epoch + 1} to batch "
                f"{skip + 1}/{len(self.train_loader)}"
            )
        self._epoch_cur, self._epoch_step = epoch, skip
        epoch_t0 = time.perf_counter()
        n_samples = 0
        last_t = epoch_t0
        last_n = 0
        preempt_break = False
        for i, batch in enumerate(
            device_prefetch(iter(self.train_loader), size=2, sharding=sharding)
        ):
            if (
                self.profile_steps > 0
                and not self._profiled
                and not self._profile_active
                and self._exec_steps == 1  # the first executed step paid
                # the compile; trace steady-state only
            ):
                jax.block_until_ready(self.state.params)
                jax.profiler.start_trace(self._profile_dir)
                self._profile_active = True
                self._profile_left = self.profile_steps
            # key folding happens on device from state.step (see __init__)
            self.state, stats = self._train_step(self.state, batch, self._base_key)
            self._exec_steps += 1
            self._epoch_step += 1
            if self._profile_active:
                self._profile_left -= 1
                if self._profile_left == 0:
                    self._stop_profile()
            n_samples += int(
                (batch["imgs"] if "imgs" in batch else batch["img_0"]).shape[0]
            )
            if self.train_iter != 0 and self.train_iter % self.print_freq == 0:
                loss = float(stats["loss_gaze"])  # device sync
                err = float(stats["error_gaze"])
                now = time.perf_counter()
                ips = (
                    self._num_views
                    * (n_samples - last_n)
                    / max(now - last_t, 1e-9)
                )
                last_t, last_n = now, n_samples
                print(
                    f"train iter {self.train_iter}: loss_gaze={loss:.5f} "
                    f"error_gaze={err:.3f} lr={float(stats['lr']):.2e} "
                    f"imgs/s={ips:.0f}"
                )
                self.writer.add_scalar("train/imgs_per_sec", ips, self.train_iter)
                self.writer.add_scalar("train/loss_gaze", loss, self.train_iter)
                self.writer.add_scalar("train/error_gaze", err, self.train_iter)
                self.writer.add_scalar("train/lr", float(stats["lr"]), self.train_iter)
                for view in ("img_0", "img_1"):
                    local = self._to_local_numpy(stats[view])
                    if local.shape[0]:
                        self.writer.add_image(
                            f"train/images_{view[-1]}",
                            make_image_grid(local),
                            self.train_iter,
                        )
            self.train_iter += 1
            if self._preempt_agreed():
                preempt_break = True
                break
        if not preempt_break:
            # natural exhaustion: this epoch is fully done — the next save
            # records (epoch + 1, 0) so a resume continues at the next epoch
            self._epoch_cur, self._epoch_step = epoch + 1, 0
        if self._profile_active:
            # epoch (or preemption) ended before the requested step count —
            # close the trace rather than leaving the profiler running
            # through eval and the next compile
            self._stop_profile()
        self.writer.flush()

    def _stop_profile(self) -> None:
        jax.block_until_ready(self.state.params)
        jax.profiler.stop_trace()
        self._profile_active = False
        self._profiled = True
        captured = self.profile_steps - self._profile_left
        print(
            f"profiler trace of {captured} train step(s) saved to "
            f"{self._profile_dir} (TensorBoard profile plugin / Perfetto)"
        )

    def _preempt_agreed(self) -> bool:
        """Preemption exit decision every host makes IDENTICALLY.

        Signal delivery is per-host and timing-dependent: under multi-host
        DP, one host breaking at iteration i while another dispatches
        iteration i+1 deadlocks the survivor in the gradient all-reduce (and
        process 0 — the only checkpoint writer — may be the survivor, so
        nothing gets saved). Allgather the local flags and exit only when
        ANY host requested it, at the same iteration everywhere. Cost: one
        int32 process allgather per train iteration, multi-host only.
        """
        flag = bool(getattr(self, "_preempted", False))
        if jax.process_count() == 1:
            return flag
        from jax.experimental import multihost_utils

        agreed = bool(
            np.any(multihost_utils.process_allgather(np.int32(flag)))
        )
        if agreed:
            # adopt globally: later checks (epoch boundary in train()) must
            # see the same decision even on hosts that got no signal
            self._preempted = True
        return agreed

    @staticmethod
    def _to_local_numpy(arr) -> np.ndarray:
        """Host copy of a (possibly globally-sharded) device array.

        Multi-host: a batch-sharded global array is not fully addressable, so
        return THIS host's rows — its addressable shards, deduplicated by
        global index (XLA may replicate small outputs across local devices)
        and concatenated in global-offset order (matching the order the
        local batch was fed)."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        if arr.is_fully_replicated:
            # replicated output of a batch-sharded computation: THIS host's
            # rows are its process-ordered block of the global batch
            # (make_array_from_process_local_data layout) — returning the
            # full array would make every host record host 0's rows.
            g = np.asarray(arr)
            per = g.shape[0] // jax.process_count()
            if per == 0:
                # fewer rows than processes (the step's image previews are
                # capped at 8 rows): an empty per-host slice would crash
                # make_image_grid — share the leading rows instead (only
                # process 0 writes TB anyway)
                return g
            i = jax.process_index()
            return g[i * per : (i + 1) * per]
        by_index = {}
        for s in arr.addressable_shards:
            # hashable key: slice objects are unhashable before Python 3.12
            key = tuple((sl.start, sl.stop, sl.step) for sl in s.index)
            by_index.setdefault(key, s)
        shards = sorted(
            by_index.values(),
            key=lambda s: s.index[0].start if s.index[0].start is not None else 0,
        )
        if not shards:
            # none of this host's devices hold any rows (e.g. an 8-row
            # preview sharded over >8 processes' devices): empty, callers
            # skip logging it
            return np.zeros((0,) + tuple(arr.shape[1:]), arr.dtype)
        return np.concatenate([np.asarray(s.data) for s in shards])

    @property
    def eval_params(self):
        """Parameters every eval-side surface (test/test_breakdown/torch
        export) scores: the EMA weights when present (--ema_decay — they are
        the deployment weights), raw params otherwise. ``batch_stats`` are
        shared either way (BN running stats are already their own EMA)."""
        if self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def test(self, epoch: int) -> float:
        """Full-test-set mean angular error in degrees, float64 on host
        (parity: /root/reference/trainer.py:164-199). Multi-host: each host
        evaluates its input shard; per-host (sum, count) pairs are allgathered
        and the global mean is identical on every host. Scores
        ``self.eval_params`` — the EMA weights when --ema_decay is on."""
        assert self.test_loader is not None
        n_test = (
            self.test_loader.num_samples()
            if hasattr(self.test_loader, "num_samples")
            else len(self.test_loader.dataset)
        )
        pred_all = np.zeros((n_test, 2))
        gt_all = np.zeros((n_test, 2))
        idx_all = np.full((n_test,), -1, np.int64)
        save_index = 0
        # Pad every batch to ONE fixed shape: the first-seen batch size
        # rounded up to the local DATA-parallel degree (on a 2-D mesh the
        # 'spatial' axis shards height, not rows). A ragged final batch
        # would otherwise both fail to shard over the mesh AND compile a
        # second eval executable (multi-minute on a tunneled TPU).
        from rot_mvgaze_tpu.parallel.mesh import dp_size

        n_dev = dp_size(self.mesh)
        n_dev_local = max(n_dev // jax.process_count(), 1)
        from rot_mvgaze_tpu.utils.padding import pad_batch

        def batches():
            target = None
            for b in iter(self.test_loader):
                bs = int((b["imgs"] if "imgs" in b else b["img_0"]).shape[0])
                if target is None:
                    target = bs + ((-bs) % n_dev_local)
                # an oversized batch (nonstandard loader) still pads to a
                # device multiple; only then would a second shape compile
                yield pad_batch(b, max(target, bs + ((-bs) % n_dev_local))), bs

        from rot_mvgaze_tpu.parallel.mesh import leaf_sharding, put_sharded

        for i, (batch, bs) in enumerate(batches()):
            if "idx_0" in batch:  # host-side, pre-sharding (for breakdowns)
                idx_all[save_index : save_index + bs] = np.asarray(
                    batch["idx_0"]
                ).reshape(-1)[:bs]
            elif "idxs" in batch:  # V-view batches: view 0 is the eval view
                idx_all[save_index : save_index + bs] = np.asarray(
                    batch["idxs"]
                )[:bs, 0]
            if self.mesh is not None:
                batch = jax.tree.map(
                    lambda x: put_sharded(x, leaf_sharding(self.mesh, x))
                    if getattr(x, "ndim", 0) > 0
                    else x,
                    batch,
                )
            out = self._eval_step(self.eval_params, self.state.batch_stats, batch)
            pred_all[save_index : save_index + bs] = self._to_local_numpy(
                out["pred_gaze"]
            )[:bs]
            gt_all[save_index : save_index + bs] = self._to_local_numpy(
                out["gt_gaze"]
            )[:bs]
            save_index += bs
            if i != 0 and i % self.print_freq == 0:
                for view in ("img_0", "img_1"):
                    local = self._to_local_numpy(out[view])
                    if local.shape[0]:
                        self.writer.add_image(
                            f"test/images_{view[-1]}",
                            make_image_grid(local),
                            i,
                        )
        if save_index != n_test:
            print(f"test saved {save_index} != dataset size {n_test}")
        errors = angular_error_numpy(pred_all[:save_index], gt_all[:save_index])
        # stash this host's per-sample view for test_breakdown() — grouping
        # reuses these arrays instead of a second eval pass/compile
        self._last_eval_errors = errors
        self._last_eval_idx = (
            idx_all[:save_index] if (idx_all[:save_index] >= 0).all() else None
        )
        self._last_eval_rows = self._loader_eval_rows(save_index)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            agg = np.asarray(
                multihost_utils.process_allgather(
                    np.array([errors.sum(), float(save_index)], np.float64)
                )
            ).reshape(-1, 2)
            avg_error = float(agg[:, 0].sum() / agg[:, 1].sum())
        else:
            avg_error = float(np.mean(errors))
        msg = f"test on epoch {epoch + 1}, error: {avg_error}\n"
        print(msg, end="")
        # logged at epoch+1 (pre-training eval -> step 0): TensorBoard
        # mishandles negative steps (VERDICT r1).
        self.writer.add_scalar("test/epoch_error_gaze", avg_error, epoch + 1)
        if self._is_primary:
            with open(osp.join(self.output_dir, "test_results.txt"), "a") as f:
                f.write(msg)
        self.writer.flush()
        return avg_error

    def _loader_eval_rows(self, save_index: int) -> "np.ndarray | None":
        """Global dataset rows the eval pass just consumed, in iteration
        order. Both loaders record the order their iteration actually
        yielded (``last_epoch_order`` — batches are consecutive slices of
        it) — this is what lets ``test_breakdown`` group by SUBJECT under
        multi-host sharding (subject = ``idx_to_kv[row][0]``), where the
        recorded ``idx_0`` column alone cannot disambiguate files.
        Validated against that column; None when the loader doesn't expose
        the contract or the order disagrees (e.g. a custom loader)."""
        loader = self.test_loader
        ds = getattr(loader, "dataset", None)
        rows = getattr(loader, "last_epoch_order", None)
        if ds is None or rows is None:
            return None
        if not hasattr(ds, "idx_to_kv") or len(ds.idx_to_kv) == 0:
            return None
        if save_index > len(rows):
            return None
        rows = np.asarray(rows)[:save_index]
        idx = self._last_eval_idx
        if idx is None:
            return None
        def _eval_row(entry):
            # stereo: (file, idx, partner) -> idx; V-view: (file, (idx, ...))
            return entry[1][0] if isinstance(entry[1], tuple) else entry[1]

        expect = np.asarray(
            [_eval_row(ds.idx_to_kv[int(r)]) for r in rows], np.int64
        )
        if not np.array_equal(np.asarray(idx, np.int64), expect):
            return None
        return rows

    # ------------------------------------------------------------------
    def test_breakdown(self) -> Dict[str, Any]:
        """Per-camera / per-subject error breakdown (beyond the reference's
        single mean). Reuses the per-sample errors collected by the most
        recent ``test()`` call — no second eval pass or compile; runs
        ``test(-1)`` first if none happened yet. Under multi-host data
        loading BOTH groupings are aggregated ACROSS hosts with the same
        (sum, count) allgather the mean uses, so every process reports the
        identical global table: camera id comes from ``idx_0 % 18``, and
        subject comes from the deterministic epoch order replay
        (``_loader_eval_rows`` → ``idx_to_kv[row][0]``; every host holds
        the full pair index, only its iteration is sharded). Per-subject
        falls back to omitted (labeled so in the report) when any host
        cannot validate its row replay — e.g. a custom loader."""
        from rot_mvgaze_tpu.evaluate import (
            breakdown_from_errors,
            format_breakdown,
        )

        assert self.test_loader is not None
        if getattr(self, "_last_eval_errors", None) is None:
            self.test(-1)
        multi_host = jax.process_count() > 1
        if multi_host:
            # Agree on the branch BEFORE any conditional collective:
            # _last_eval_idx is a per-host, data-dependent condition (a host
            # whose loader omitted idx_0 has None), and hosts diverging here
            # would leave one side waiting in the camera allgather forever.
            # This flag exchange is itself a collective, but an
            # unconditional one — every process reaches it.
            from jax.experimental import multihost_utils

            flags = np.asarray(
                multihost_utils.process_allgather(
                    np.array(
                        [
                            1.0 if self._last_eval_idx is not None else 0.0,
                            1.0
                            if getattr(self, "_last_eval_rows", None)
                            is not None
                            else 0.0,
                        ]
                    )
                )
            ).reshape(-1, 2)
            all_have_idx = bool(flags[:, 0].min() > 0)
            all_have_rows = bool(flags[:, 1].min() > 0)
        else:
            all_have_idx = False
            all_have_rows = False
        if multi_host and all_have_idx:
            detail = self._allgather_breakdown(with_subjects=all_have_rows)
            note = (
                ""
                if all_have_rows
                else "; per-subject omitted (a host could not replay its "
                "eval row order)"
            )
            report = (
                f"[aggregated over {jax.process_count()} processes{note}]\n"
                + format_breakdown(detail)
            )
        else:
            detail = breakdown_from_errors(
                self._last_eval_errors,
                idx_0=self._last_eval_idx,
                dataset=(
                    None
                    if multi_host
                    else getattr(self.test_loader, "dataset", None)
                ),
                rows=(
                    None if multi_host else getattr(
                        self, "_last_eval_rows", None
                    )
                ),
            )
            report = format_breakdown(detail)
            if multi_host:
                report = (
                    f"[process {jax.process_index()} input shard only]\n"
                    + report
                )
        print(report, end="")
        if self._is_primary:
            with open(osp.join(self.output_dir, "test_results.txt"), "a") as f:
                f.write(report)
        return detail

    @staticmethod
    def _allgather_group_stats(labels: np.ndarray, errs: np.ndarray,
                               n_groups: int) -> np.ndarray:
        """(sum, count) per group, summed over all processes. The fixed
        ``n_groups`` shape makes the allgather shape-stable no matter which
        groups a host's shard happened to contain."""
        from jax.experimental import multihost_utils

        sums = np.zeros((n_groups,), np.float64)
        counts = np.zeros((n_groups,), np.float64)
        np.add.at(sums, labels, errs)
        np.add.at(counts, labels, 1.0)
        return np.asarray(
            multihost_utils.process_allgather(
                np.stack([sums, counts], axis=-1)
            ),
            np.float64,
        ).reshape(-1, n_groups, 2).sum(axis=0)

    def _allgather_breakdown(self, with_subjects: bool) -> Dict[str, Any]:
        """Global per-camera (and, when every host replayed its eval row
        order, per-subject) tables from per-host (sum, count) vectors."""
        from rot_mvgaze_tpu.data.pairing import NUM_CAMERAS

        cams = np.asarray(self._last_eval_idx).reshape(-1) % NUM_CAMERAS
        errs = np.asarray(self._last_eval_errors, np.float64)
        agg = self._allgather_group_stats(cams, errs, NUM_CAMERAS)
        per_camera = {
            int(c): {
                "error": float(agg[c, 0] / agg[c, 1]),
                "n": int(agg[c, 1]),
            }
            for c in range(NUM_CAMERAS)
            if agg[c, 1] > 0
        }
        per_subject = None
        if with_subjects:
            # Every host constructs the IDENTICAL full dataset (only
            # iteration is sharded), so the sorted subject vocabulary —
            # and therefore the group indexing — agrees across processes.
            ds = self.test_loader.dataset
            vocab = sorted({kv[0] for kv in ds.idx_to_kv})
            pos = {s: i for i, s in enumerate(vocab)}
            subj = np.asarray(
                [
                    pos[ds.idx_to_kv[int(r)][0]]
                    for r in self._last_eval_rows
                ],
                np.int64,
            )
            sagg = self._allgather_group_stats(subj, errs, len(vocab))
            per_subject = {
                vocab[i]: {
                    "error": float(sagg[i, 0] / sagg[i, 1]),
                    "n": int(sagg[i, 1]),
                }
                for i in range(len(vocab))
                if sagg[i, 1] > 0
            }
        total_n = agg[:, 1].sum()
        return {
            "mean_error": float(agg[:, 0].sum() / total_n),
            "n": int(total_n),
            "per_camera": per_camera,
            "per_subject": per_subject,
        }

    # ------------------------------------------------------------------
    def save_checkpoint(self, add: Optional[str] = None) -> str:
        from flax import serialization

        from rot_mvgaze_tpu.train.checkpoints import save_state

        name = add if add is not None else "ckpt"
        path = osp.join(self.ckpt_dir, name + ".msgpack")
        if not self._is_primary:
            # state is replicated: process 0's save IS the complete
            # checkpoint; concurrent same-path writes on a shared
            # filesystem would corrupt it (Trainer.__init__ broadcasts
            # state from process 0 on resume, so non-shared filesystems
            # resume correctly too)
            return path
        # TrainState plus the epoch position, so a resume is step-exact:
        # deriving epochs from step // steps_per_epoch alone drifts once a
        # mid-epoch save exists in the lineage (the partial epoch's steps
        # inflate the floor) and silently mis-counts if the batch size
        # changes between runs. `epoch_meta` is popped before
        # from_state_dict on restore; readers that only want variables
        # (serving, converters) never look at it.
        tree = serialization.to_state_dict(jax.device_get(self.state))
        if tree.get("ema_params") is None:
            # Runs without --ema_decay keep the pre-EMA checkpoint layout
            # byte-identical: a serialized None ema_params field would make
            # every checkpoint fail from_state_dict ("unknown field") in
            # older builds of this framework, for a feature the run never
            # used. Restore normalizes the missing key back (Trainer
            # __init__ seeds the EMA from params when --ema_decay turns on
            # mid-lineage).
            tree.pop("ema_params", None)
        tree["epoch_meta"] = {
            "epochs_done": int(self._epoch_cur),
            "epoch_step": int(self._epoch_step),
            "steps_per_epoch": int(self.steps_per_epoch),
        }
        save_state(path, tree)
        print(f"save file to: {path}")
        # Retention: keep only the newest N checkpoints when configured
        # (long preemption-heavy runs otherwise accumulate full-state saves).
        keep = int(getattr(self.config, "keep_last_n", 0) or 0)
        if keep > 0:
            import glob

            ckpts = sorted(
                glob.glob(osp.join(self.ckpt_dir, "*.msgpack")),
                key=os.path.getmtime,
            )
            for old in ckpts[:-keep]:
                os.remove(old)
        return path

    def export_torch_checkpoint(self, path: str) -> str:
        """Export current weights as a reference-format ``.pth.tar`` state
        dict (interop: run our weights in the reference codebase). Exports
        ``eval_params`` — the EMA weights when --ema_decay is on, i.e. the
        same weights ``test()`` scores."""
        import torch

        from rot_mvgaze_tpu.compat import flax_to_torch_state_dict

        from rot_mvgaze_tpu.serving import MODEL_CONFIG_KEYS

        # getattr default False: see _load_checkpoint_variables
        cfg = {k: getattr(self.model, k, False) for k in MODEL_CONFIG_KEYS}
        variables = {
            "params": jax.device_get(self.eval_params),
            "batch_stats": jax.device_get(self.state.batch_stats),
        }
        # strict_compatible: the reference loads checkpoints with
        # load_state_dict(strict=True) (/root/reference/trainer.py:47,
        # main.py:255), so the export must include the never-used keys
        # (num_batches_tracked, backbone fc) it expects.
        sd = flax_to_torch_state_dict(variables, strict_compatible=True, **cfg)
        # np.array copy: device_get can hand back non-writable views, and
        # torch.from_numpy on those emits a UserWarning (torch tensors assume
        # write access to the shared buffer)
        torch.save(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, path
        )
        return path


def _jsonable(v: Any) -> bool:
    """True if v survives yaml.safe_dump — checked by actually trying it.
    A top-level type check let lists/dicts CONTAINING non-representable
    values (Path, enum, numpy scalar) through, and safe_dump then crashed
    Trainer.__init__ before a single step ran."""
    import yaml

    try:
        yaml.safe_dump(v)
        return True
    except yaml.YAMLError:
        return False
