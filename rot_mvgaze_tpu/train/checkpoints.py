"""Checkpointing: params + batch_stats + opt_state + step.

Subsumes the reference's epoch-granular ``torch.save(state_dict())``
(/root/reference/trainer.py:150-160, which drops optimizer/schedule state);
restoring here resumes the optimizer exactly.

Format: single-file msgpack via ``flax.serialization`` — self-describing
(restorable without a template via ``msgpack_restore``), host-independent,
and trivially rsync-able. ``Trainer.save_checkpoint`` adds an ``epoch_meta``
sibling key ({epochs_done, epoch_step, steps_per_epoch}) next to the
TrainState fields so resumes are step-exact; readers that only want
variables ignore it, and ``Trainer.__init__`` pops it before
``from_state_dict``. ``save_state_orbax``/``restore_state_orbax`` offer
the Orbax directory format for async / multi-host checkpointing at scale.
Torch ``.pth.tar`` interop lives in rot_mvgaze_tpu.compat.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
from flax import serialization


def save_state(path: str, state: Any) -> str:
    """Save any pytree (TrainState or bare variables) to one msgpack file.

    Atomic: written to a temp file in the same directory, fsync'd, then
    renamed over the target. A preemption mid-write must never leave a
    truncated .msgpack with the newest mtime — ``find_latest_checkpoint``
    would select it and every ``--auto_resume`` restart would fail on the
    unpack error instead of falling back to the intact previous save.
    """
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(state)))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


save_variables = save_state


def restore_state(path: str, template: Any) -> Any:
    """Restore into an existing pytree structure (exact round-trip)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def restore_tree(path: str) -> Any:
    """Restore a checkpoint with its saved structure (nested dicts)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_state_from_tree(tree: Any, template: Any) -> Any:
    """Restore into an existing pytree from an already-parsed checkpoint
    tree (``restore_tree`` output) — lets one file read serve both the
    variables load and the full-state probe/restore instead of
    deserializing the same multi-hundred-MB msgpack repeatedly."""
    return serialization.from_state_dict(template, tree)


def variables_from_tree(
    tree: Any,
    template: Dict[str, Any],
    source: str = "checkpoint",
    prefer_ema: bool = True,
) -> Dict[str, Any]:
    """Model variables from a parsed checkpoint tree (full TrainState or
    bare ``{'params'[, 'batch_stats']}``).

    A checkpoint trained with ``--ema_decay`` carries an ``ema_params``
    sibling tree; weight-only consumers (serving, AOT export, evaluate,
    warm starts) get THOSE — the EMA weights are what ``Trainer.test``
    scores and what you deploy; the raw params tree is skipped, and the
    printed note says so. ``prefer_ema=False`` opts out (the Trainer uses
    it when a full-state resume immediately follows, where this result is
    only an optimizer-init template and a swap note would mislead)."""
    if "params" not in tree:
        raise ValueError(f"{source} has no 'params': {list(tree)}")
    if prefer_ema and tree.get("ema_params") is not None:
        print(
            f"{source}: using the EMA weights (ema_params, what "
            "--ema_decay training evaluates/deploys); the raw params "
            "tree is skipped"
        )
        tree = {**tree, "params": tree["ema_params"]}
    if not tree.get("batch_stats") and template.get("batch_stats"):
        # Silently substituting init-time BN statistics (mean=0, var=1)
        # would make eval-mode forwards garbage with no warning — the
        # reference's strict torch load fails loudly on missing keys too.
        raise ValueError(
            f"{source} has no 'batch_stats' but the model uses BatchNorm; "
            "refusing to pair trained params with freshly-initialized "
            "statistics. Save/convert a checkpoint that includes them."
        )
    return {
        "params": tree["params"],
        "batch_stats": tree.get("batch_stats", template.get("batch_stats", {})),
    }


def restore_variables(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore model variables from either a full TrainState checkpoint or a
    bare ``{'params', 'batch_stats'}`` checkpoint."""
    return variables_from_tree(restore_tree(path), template, source=f"checkpoint at {path}")


def find_latest_checkpoint(ckpt_dir: str) -> "str | None":
    """Most recently written ``*.msgpack`` checkpoint in a directory, or
    None. Used by ``--auto_resume`` to restart after preemption."""
    import glob

    candidates = glob.glob(os.path.join(ckpt_dir, "*.msgpack"))
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)


# ---------------------------------------------------------------------------
# Orbax directory format (async-capable, multi-host) — optional path.
# ---------------------------------------------------------------------------


def save_state_orbax(path: str, state: Any) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_state_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)
