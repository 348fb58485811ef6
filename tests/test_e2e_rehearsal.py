"""Cross-framework end-to-end eval rehearsal (VERDICT r2 item #2, widened
to every protocol class in r4 per VERDICT r3 item #5).

The only tests that exercise dataset + preprocessing + pairing + forward +
metric JOINTLY across frameworks: train the reference itself (torch, CPU,
executed in place via reference_harness) a few steps on a tiny synthetic
corpus, save its ``.pth.tar``, then run

- the reference's own eval loop (/root/reference/trainer.py:164-199), and
- our ``Trainer.test`` from the SAME checkpoint over the SAME corpus and the
  SAME frozen pair index (``pairing="reference"``),

and assert the two reported mean angular errors agree to <=0.1 deg — the
BASELINE.json protocol-parity budget. Five protocol classes are rehearsed,
covering every config class BASELINE.json names:

1. default config, known-camera split (``camera_tag='all'``) — the shipped
   eval protocol (/root/reference/main.py:124-125,231-236);
2. the NOVEL-camera split (``novel_train``/``novel_test`` tags,
   /root/reference/dataset/gaze.py:39-44 via main.py:126-127) — different
   valid-camera sets change both the pair-index draw order and the eval
   subset;
3. the ``share_feature=True`` ablation (/root/reference/models/rot_mv.py:
   161-171) — exercises the IntensityBatchNorm running-std buffer through
   checkpoint conversion, the most conversion-sensitive variant;
4. the ``encode_rotmat=True`` ablation (ImageRotmatFeatFuser,
   /root/reference/models/rot_mv.py:53-67);
5. the reverse transfer direction (mpiinv2xgaze: eval on XGaze), driving
   the BGR->RGB read path end-to-end;
6. the ``ignore_rotmat=True`` ablation ("no rotation constraint",
   /root/reference/models/rot_mv.py:141-142,226-232);
7. the ``share_weights=True`` ablation (one fuser/head instance aliased
   across iterations, /root/reference/models/rot_mv.py:151-158) — the
   conversion must map every ``iter_i`` key onto the SAME parameters.

Together 3+4+6+7 rehearse every ablation flag of the reference model
end-to-end (train -> convert -> eval), not just at output-parity level.

Skips cleanly without torch or the reference tree.
"""

import os
import random
from types import SimpleNamespace

import numpy as np
import pytest

from rot_mvgaze_tpu.data import BatchLoader, GazeDataset
from rot_mvgaze_tpu.data.synthetic import write_synthetic_dataset
from rot_mvgaze_tpu.losses import IterationLoss, StereoL1Loss
from rot_mvgaze_tpu.models import FeatRotationSymm
from rot_mvgaze_tpu.train import Trainer

from reference_harness import (
    import_reference_dataset,
    import_reference_models,
    import_reference_trainer,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

SEED = 0
IMAGE_SIZE = 32
BATCH = 9
DEFAULT_MODEL_CFG = dict(
    backbone_depth=18,
    num_iter=2,
    share_weights=False,
    encode_rotmat=False,
    share_feature=False,
    ignore_rotmat=False,
)


def _torch_test_transform(image_size: int):
    """Numerically exact stand-in for the reference's test transform
    (/root/reference/main.py:51-56: ToPILImage -> ToTensor -> Resize(224,
    antialias=True) -> Normalize). torchvision is absent in this image, so
    the same math is expressed in plain torch: the corpus is written AT the
    target size, making Resize the identity (as it is for real XGaze's 224^2
    patches), and ToTensor is uint8 HWC -> float CHW / 255."""
    import torch

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

    def transform(img_uint8_hwc):
        assert img_uint8_hwc.shape[:2] == (image_size, image_size)
        x = torch.from_numpy(
            np.ascontiguousarray(img_uint8_hwc.transpose(2, 0, 1))
        ).float() / 255.0
        return (x - mean) / std

    return transform


def _run_reference_rehearsal(
    tmp_path_factory, model_cfg, train_tag, test_tag,
    train_ds=("xgaze", "bgr"), test_ds=("mpiinv", "rgb"),
):
    """Train the reference a few steps, save its ckpt, run its eval."""
    import torch
    from torch.utils.data import DataLoader

    ref_gaze = import_reference_dataset()
    ref_trainer_mod = import_reference_trainer()
    import_reference_models()  # sys.path + download disable
    import losses.stereo_loss as ref_stereo  # type: ignore
    import models.rot_mv as ref_rot_mv  # type: ignore

    root = str(tmp_path_factory.mktemp("corpus"))
    subjects = write_synthetic_dataset(
        root, ["s00.h5", "s01.h5"], n_frames=3, image_size=IMAGE_SIZE
    )

    # the reference protocol: seed the global generators, build train
    # dataset then test dataset (/root/reference/main.py:216,224) — the
    # draw ORDER matters because both consume the one global `random`
    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    transform = _torch_test_transform(IMAGE_SIZE)
    ref_train = ref_gaze.GazeDataset(
        dataset_name=train_ds[0], dataset_path=root, color_type=train_ds[1],
        image_transform=transform, keys_to_use=subjects,
        camera_tag=train_tag, stereo=True,
    )
    ref_test = ref_gaze.GazeDataset(
        dataset_name=test_ds[0], dataset_path=root, color_type=test_ds[1],
        image_transform=transform, keys_to_use=subjects,
        camera_tag=test_tag, stereo=True,
    )
    train_loader = DataLoader(
        ref_train, batch_size=BATCH, shuffle=True, num_workers=0
    )
    test_loader = DataLoader(
        ref_test, batch_size=BATCH, shuffle=False, num_workers=0
    )

    model = ref_rot_mv.FeatRotationSymm(**model_cfg)
    stereo = ref_stereo.StereoL1Loss(
        rel_weight=0.01, reference_decay=1.0,
        distance_metric="angular_error", pred_gaze_key="pred_gaze",
    )
    metrics = ref_stereo.IterationLoss(loss=stereo, iter_decay=0.5)

    out_dir = str(tmp_path_factory.mktemp("ref_logs"))
    config = SimpleNamespace(
        ckpt_resume=None, batch_size=BATCH, output_dir=out_dir,
        print_freq=10**9, save_epoch=10**9, seed=SEED,
    )
    trainer = ref_trainer_mod.Trainer(
        config=config, model=model, metrics=metrics,
        train_loader=train_loader, test_loader=test_loader,
    )
    trainer.train_one_epoch(0)  # a few real optimizer steps

    ckpt_path = os.path.join(out_dir, "rehearsal.pth.tar")
    torch.save(model.state_dict(), ckpt_path)
    ref_error = trainer.test(-1)
    return {
        "root": root,
        "subjects": subjects,
        "ckpt": ckpt_path,
        "ref_error": float(ref_error),
        "ref_test_index": [tuple(t) for t in ref_test.idx_to_kv],
        "model_cfg": dict(model_cfg),
        "train_tag": train_tag,
        "test_tag": test_tag,
        "train_ds": train_ds,
        "test_ds": test_ds,
    }


def _assert_our_eval_matches(rehearsal, tmp_path):
    """Our --mode test from the reference's checkpoint reports the same mean
    error (<=0.1 deg) over the same corpus and pair index."""
    # ONE replayed generator across train-then-test construction — the
    # reference's global-`random` draw-order dependency
    pair_rng = random.Random(SEED)
    ours_train = GazeDataset(
        rehearsal["train_ds"][0], rehearsal["root"],
        rehearsal["train_ds"][1], rehearsal["subjects"],
        camera_tag=rehearsal["train_tag"], seed=SEED,
        pairing="reference", pair_rng=pair_rng,
    )
    ours_test = GazeDataset(
        rehearsal["test_ds"][0], rehearsal["root"],
        rehearsal["test_ds"][1], rehearsal["subjects"],
        camera_tag=rehearsal["test_tag"], seed=SEED,
        pairing="reference", pair_rng=pair_rng,
    )
    assert ours_test.idx_to_kv == rehearsal["ref_test_index"]

    cfg = SimpleNamespace(
        mode="test", exp_name="rehearsal",
        output_dir=str(tmp_path / "logs"), ckpt_resume=rehearsal["ckpt"],
        print_freq=10**9, seed=SEED, batch_size=BATCH,
        test_batch_size=BATCH, epochs=1, save_epoch=10**9,
        image_size=IMAGE_SIZE, scheduler_step="epoch",
    )
    model = FeatRotationSymm(**rehearsal["model_cfg"])
    metrics = IterationLoss(
        loss=StereoL1Loss(rel_weight=0.01), iter_decay=0.5
    )
    trainer = Trainer(
        cfg, model, metrics,
        BatchLoader(ours_train, batch_size=BATCH, shuffle=True,
                    drop_last=True),
        BatchLoader(ours_test, batch_size=BATCH),
    )
    our_error = trainer.test(-1)
    ours_train.close()
    ours_test.close()

    delta = abs(our_error - rehearsal["ref_error"])
    print(f"[{rehearsal['train_tag']}/{rehearsal['test_tag']} "
          f"{rehearsal['model_cfg']}] "
          f"reference: {rehearsal['ref_error']:.4f} deg  "
          f"ours: {our_error:.4f} deg  delta: {delta:.4f} deg")
    assert delta <= 0.1, (
        f"protocol parity violated: reference {rehearsal['ref_error']:.4f} "
        f"vs ours {our_error:.4f} deg (delta {delta:.4f} > 0.1)"
    )


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    return _run_reference_rehearsal(
        tmp_path_factory, DEFAULT_MODEL_CFG, "all", "all"
    )


@pytest.fixture(scope="module")
def rehearsal_novel(tmp_path_factory):
    return _run_reference_rehearsal(
        tmp_path_factory, DEFAULT_MODEL_CFG, "novel_train", "novel_test"
    )


@pytest.fixture(scope="module")
def rehearsal_share_feature(tmp_path_factory):
    cfg = dict(DEFAULT_MODEL_CFG, share_feature=True)
    return _run_reference_rehearsal(tmp_path_factory, cfg, "all", "all")


@pytest.fixture(scope="module")
def rehearsal_encode_rotmat(tmp_path_factory):
    cfg = dict(DEFAULT_MODEL_CFG, encode_rotmat=True)
    return _run_reference_rehearsal(tmp_path_factory, cfg, "all", "all")


@pytest.fixture(scope="module")
def rehearsal_reverse_direction(tmp_path_factory):
    # mpiinv2xgaze: train on MPII-NV (rgb, pitch-flip), TEST on XGaze —
    # the eval path exercises the BGR->RGB conversion
    # (/root/reference/main.py:149-167, dataset/gaze.py:108-109)
    return _run_reference_rehearsal(
        tmp_path_factory, DEFAULT_MODEL_CFG, "all", "all",
        train_ds=("mpiinv", "rgb"), test_ds=("xgaze", "bgr"),
    )


def test_eval_protocol_parity(rehearsal, tmp_path):
    _assert_our_eval_matches(rehearsal, tmp_path)


def test_eval_protocol_parity_novel_cameras(rehearsal_novel, tmp_path):
    # *_novel experiments: train on 12 cameras, eval on the held-out 6
    # (/root/reference/main.py:126-127, dataset/gaze.py:39-44) — every test
    # pair must draw BOTH views from the held-out camera set
    novel_test_cams = set(range(2, 18, 3))
    index = rehearsal_novel["ref_test_index"]
    assert index, "novel_test produced an empty pair index"
    assert all(
        idx % 18 in novel_test_cams and idx_b % 18 in novel_test_cams
        for _f, idx, idx_b in index
    )
    _assert_our_eval_matches(rehearsal_novel, tmp_path)


def test_eval_protocol_parity_share_feature_ablation(
    rehearsal_share_feature, tmp_path
):
    # the IntensityBatchNorm running-std buffer rides the checkpoint —
    # the reference stores it under the (misleading) name
    # `_batchnorm.running_mean` (/root/reference/models/rot_mv.py:16);
    # conversion must carry it
    import torch

    state = torch.load(rehearsal_share_feature["ckpt"], map_location="cpu")
    assert any("_batchnorm.running_mean" in k for k in state), list(state)
    _assert_our_eval_matches(rehearsal_share_feature, tmp_path)


def test_eval_protocol_parity_encode_rotmat_ablation(
    rehearsal_encode_rotmat, tmp_path
):
    # encode_rotmat: ImageRotmatFeatFuser consumes the UNROTATED other-view
    # feature plus the flattened relative rotmat
    # (/root/reference/models/rot_mv.py:53-67,219-225)
    _assert_our_eval_matches(rehearsal_encode_rotmat, tmp_path)


def test_eval_protocol_parity_reverse_direction(
    rehearsal_reverse_direction, tmp_path
):
    # mpiinv2xgaze: eval on XGaze drives the BGR->RGB read path end-to-end
    _assert_our_eval_matches(rehearsal_reverse_direction, tmp_path)


@pytest.fixture(scope="module")
def rehearsal_ignore_rotmat(tmp_path_factory):
    cfg = dict(DEFAULT_MODEL_CFG, ignore_rotmat=True)
    return _run_reference_rehearsal(tmp_path_factory, cfg, "all", "all")


@pytest.fixture(scope="module")
def rehearsal_share_weights(tmp_path_factory):
    cfg = dict(DEFAULT_MODEL_CFG, share_weights=True)
    return _run_reference_rehearsal(tmp_path_factory, cfg, "all", "all")


def test_eval_protocol_parity_ignore_rotmat_ablation(
    rehearsal_ignore_rotmat, tmp_path
):
    # ignore_rotmat: the fuser consumes the UNROTATED other-view feature —
    # the "no rotation constraint" ablation
    # (/root/reference/models/rot_mv.py:141-142,226-232)
    _assert_our_eval_matches(rehearsal_ignore_rotmat, tmp_path)


def test_eval_protocol_parity_share_weights_ablation(
    rehearsal_share_weights, tmp_path
):
    # share_weights: the reference aliases ONE fuser/head instance
    # num_iter times ([module] * num_iter,
    # /root/reference/models/rot_mv.py:151-158). torch's state_dict
    # recursion does NOT dedup aliases, so keys exist under EVERY iter
    # index but reference the same storage — verify that aliasing (the
    # trained iters must have stayed in lockstep), since conversion maps
    # each unrolled iteration from its own (identical) key set
    import torch

    state = torch.load(rehearsal_share_weights["ckpt"], map_location="cpu")
    fuser_idx = {
        k.split(".")[1] for k in state if k.startswith("_img_fusers.")
    }
    assert fuser_idx == {"0", "1"}, sorted(fuser_idx)
    for k in state:
        if k.startswith("_img_fusers.0"):
            twin = k.replace("_img_fusers.0", "_img_fusers.1", 1)
            assert state[k].data_ptr() == state[twin].data_ptr(), k
    _assert_our_eval_matches(rehearsal_share_weights, tmp_path)
