"""Standalone evaluation helpers (outside the Trainer loop).

``evaluate_gaze`` reproduces the reference eval protocol
(/root/reference/trainer.py:164-199): jitted forward over the test loader,
mean angular error in degrees computed host-side in float64. Works for both
the two-view FeatRotationSymm and the single-view baseline.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from rot_mvgaze_tpu.augment.ops import eval_preprocess
from rot_mvgaze_tpu.geometry import angular_error_numpy, rotation_matrix_2d

# jitted eval forwards keyed by (model, image_size, single_view): repeated
# evaluate_gaze* calls (per-epoch evals, checkpoint sweeps) reuse one
# compiled executable instead of retracing per call — recompiles are
# multi-minute on a tunneled TPU. flax modules hash by their static config;
# an unhashable custom model just skips the cache. Bounded LRU: a checkpoint
# sweep over many distinct model configs must not retain every executable
# (and the model references they close over) for the process lifetime.
_FORWARD_CACHE: "OrderedDict[Any, Any]" = OrderedDict()
_FORWARD_CACHE_MAX = 8


def _eval_forward(model: Any, image_size: int, single_view: bool):
    # The protocol metric always runs float32 regardless of the model's
    # training compute dtype (same rule as Trainer.__init__: the headline
    # error must not absorb bf16 forward rounding) — otherwise a sweep over
    # a bf16-configured model would report numbers incomparable to
    # Trainer.test / the BASELINE parity target for the same checkpoint.
    if getattr(model, "dtype", jnp.float32) != jnp.float32:
        if hasattr(model, "clone"):
            model = model.clone(dtype=jnp.float32)
        else:
            # A custom model we cannot re-dtype would silently report a
            # metric that absorbs its training-dtype rounding — say so
            # loudly rather than produce numbers incomparable to the
            # float32 protocol.
            import warnings

            warnings.warn(
                f"evaluate: model dtype {getattr(model, 'dtype', None)} is "
                "not float32 and the model has no .clone(); the protocol "
                "metric will include non-f32 forward rounding",
                RuntimeWarning,
                stacklevel=3,
            )
    try:
        key = (model, image_size, single_view)
        cached = _FORWARD_CACHE.get(key)
        if cached is not None:
            _FORWARD_CACHE.move_to_end(key)
            return cached
    except TypeError:
        key = None

    if single_view:

        @jax.jit
        def fwd(variables, batch):
            data: Dict[str, Any] = {
                "img_0": eval_preprocess(batch["img_0"], image_size)
            }
            out = model.apply(variables, data, train=False)
            return out["pred_gaze"]

    else:
        # ONE owner of the two-view eval-forward protocol: Trainer.test and
        # evaluate_gaze must run the identical preprocess+rotation+apply
        # chain or the same checkpoint could report incomparable metrics.
        from rot_mvgaze_tpu.train.steps import make_eval_step

        eval_step = make_eval_step(model, image_size=image_size)

        @jax.jit
        def fwd(variables, batch):
            return eval_step(
                variables["params"], variables.get("batch_stats", {}), batch
            )["pred_gaze"]

    if key is not None:
        _FORWARD_CACHE[key] = fwd
        while len(_FORWARD_CACHE) > _FORWARD_CACHE_MAX:
            _FORWARD_CACHE.popitem(last=False)
    return fwd


def evaluate_gaze(
    model: Any,
    variables: Dict[str, Any],
    loader: Iterable,
    image_size: int = 224,
    single_view: bool = False,
) -> float:
    """Mean angular error (degrees, float64 host math) over a test loader."""
    return evaluate_gaze_detailed(
        model, variables, loader, image_size=image_size,
        single_view=single_view,
    )["mean_error"]


def evaluate_gaze_detailed(
    model: Any,
    variables: Dict[str, Any],
    loader: Iterable,
    *,
    dataset: Any = None,
    image_size: int = 224,
    single_view: bool = False,
) -> Dict[str, Any]:
    """Eval protocol + per-group error breakdown (beyond the reference's
    single mean, /root/reference/trainer.py:192-198).

    Returns ``{"mean_error", "n", "per_camera", "per_subject"}``:

    - ``per_camera``: keyed by camera id (``idx_0 % 18`` — the frame-major
      row layout of /root/reference/dataset/gaze.py:62-65); present when the
      loader batches carry ``idx_0``.
    - ``per_subject``: present when ``dataset`` (a GazeDataset /
      PackedGazeDataset with ``idx_to_kv``) is given and the loader iterates
      in dataset order (eval loaders here never shuffle); sample i maps to
      ``dataset.idx_to_kv[i][0]``.

    Each group value is ``{"error": mean_deg, "n": count}``.
    """
    fwd = _eval_forward(model, image_size, single_view)

    def step(batch):
        return fwd(variables, batch)

    from rot_mvgaze_tpu.utils.padding import pad_batch

    preds, gts, idxs = [], [], []
    # Pad every batch to the first-seen (full) batch size so the jitted step
    # compiles exactly once — a ragged final batch would otherwise trigger a
    # second multi-minute compile on a tunneled TPU. Padding repeats the last
    # sample; its predictions are trimmed before the metric.
    full_bs = None
    for batch in loader:
        # gt keys ride along for the shared make_eval_step (it echoes them
        # back; predictions are what we read) — the metric itself is still
        # computed host-side in float64 from the loader's original labels
        device_batch = {
            k: np.asarray(v)
            for k, v in batch.items()
            if k in (
                "img_0", "img_1", "head_pose_0", "head_pose_1",
                "gt_gaze", "gt_gaze_1",
            )
        }
        bs = device_batch["img_0"].shape[0]
        if full_bs is None:
            full_bs = bs
        device_batch = pad_batch(device_batch, full_bs)
        preds.append(np.asarray(step(device_batch))[:bs])
        gts.append(np.asarray(batch["gt_gaze"]))
        if "idx_0" in batch:
            idxs.append(np.asarray(batch["idx_0"]).reshape(-1))
    if not preds:
        raise ValueError(
            "evaluate_gaze_detailed: the loader yielded no batches — empty "
            "per-host shard, or a dataset smaller than the process count?"
        )
    pred_all = np.concatenate(preds)
    gt_all = np.concatenate(gts)
    errors = angular_error_numpy(pred_all, gt_all)
    idx_0 = (
        np.concatenate(idxs)
        if idxs and sum(i.shape[0] for i in idxs) == errors.shape[0]
        else None
    )
    return breakdown_from_errors(errors, idx_0=idx_0, dataset=dataset)


def breakdown_from_errors(
    errors: np.ndarray,
    idx_0: "np.ndarray | None" = None,
    dataset: Any = None,
    rows: "np.ndarray | None" = None,
) -> Dict[str, Any]:
    """Group per-sample angular errors: per camera (``idx_0 % 18``) and per
    subject (``dataset.idx_to_kv`` order). Used by both the standalone
    evaluator and ``Trainer.test`` (which reuses its already-computed
    per-sample errors — no second eval pass). ``rows`` — the dataset row
    each error came from, in eval order — enables per-subject grouping even
    when the eval covered a reordered or truncated subset (without it the
    fallback assumes errors[i] is dataset row i and requires a full pass)."""

    def group_stats(labels):
        out = {}
        for lab in sorted(set(labels.tolist())):
            m = labels == lab
            out[lab] = {
                "error": float(np.mean(errors[m])),
                "n": int(np.sum(m)),
            }
        return out

    result: Dict[str, Any] = {
        "mean_error": float(np.mean(errors)),
        "n": int(errors.shape[0]),
        "per_camera": None,
        "per_subject": None,
    }
    if idx_0 is not None and idx_0.shape[0] == errors.shape[0]:
        from rot_mvgaze_tpu.data.pairing import NUM_CAMERAS

        result["per_camera"] = group_stats(
            np.asarray(idx_0).reshape(-1) % NUM_CAMERAS
        )
    if dataset is not None and hasattr(dataset, "idx_to_kv"):
        if rows is not None and rows.shape[0] == errors.shape[0]:
            subjects = np.asarray(
                [dataset.idx_to_kv[int(r)][0] for r in rows]
            )
            result["per_subject"] = group_stats(subjects)
        elif len(dataset.idx_to_kv) == errors.shape[0]:
            subjects = np.asarray(
                [kv[0] for kv in dataset.idx_to_kv[: errors.shape[0]]]
            )
            result["per_subject"] = group_stats(subjects)
    return result


def format_breakdown(detail: Dict[str, Any]) -> str:
    """Render evaluate_gaze_detailed output as the text block appended to
    test_results.txt by ``--test_breakdown``."""
    lines = [
        f"mean error: {detail['mean_error']:.4f} deg over {detail['n']} samples"
    ]
    for group in ("per_camera", "per_subject"):
        stats = detail.get(group)
        if not stats:
            continue
        lines.append(f"{group}:")
        for lab, s in stats.items():
            lines.append(f"  {lab}: {s['error']:.4f} deg (n={s['n']})")
    return "\n".join(lines) + "\n"
