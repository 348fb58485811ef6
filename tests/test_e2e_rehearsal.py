"""Cross-framework end-to-end eval rehearsal (VERDICT r2 item #2).

The only test that exercises dataset + preprocessing + pairing + forward +
metric JOINTLY across frameworks: train the reference itself (torch, CPU,
executed in place via reference_harness) a few steps on a tiny synthetic
corpus, save its ``.pth.tar``, then run

- the reference's own eval loop (/root/reference/trainer.py:164-199), and
- our ``Trainer.test`` from the SAME checkpoint over the SAME corpus and the
  SAME frozen pair index (``pairing="reference"``),

and assert the two reported mean angular errors agree to <=0.1 deg — the
BASELINE.json protocol-parity budget. Skips cleanly without torch or the
reference tree.
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
MODEL_CFG = dict(
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


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
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
    # dataset then test dataset (/root/reference/main.py:216,224)
    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    transform = _torch_test_transform(IMAGE_SIZE)
    ref_train = ref_gaze.GazeDataset(
        dataset_name="xgaze", dataset_path=root, color_type="bgr",
        image_transform=transform, keys_to_use=subjects, camera_tag="all",
        stereo=True,
    )
    ref_test = ref_gaze.GazeDataset(
        dataset_name="mpiinv", dataset_path=root, color_type="rgb",
        image_transform=transform, keys_to_use=subjects, camera_tag="all",
        stereo=True,
    )
    train_loader = DataLoader(
        ref_train, batch_size=BATCH, shuffle=True, num_workers=0
    )
    test_loader = DataLoader(
        ref_test, batch_size=BATCH, shuffle=False, num_workers=0
    )

    model = ref_rot_mv.FeatRotationSymm(**MODEL_CFG)
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
    }


def test_eval_protocol_parity(rehearsal, tmp_path):
    """Our --mode test from the reference's checkpoint reports the same mean
    error (<=0.1 deg) over the same corpus and pair index."""
    pair_rng = random.Random(SEED)
    ours_train = GazeDataset(
        "xgaze", rehearsal["root"], "bgr", rehearsal["subjects"],
        camera_tag="all", seed=SEED, pairing="reference", pair_rng=pair_rng,
    )
    ours_test = GazeDataset(
        "mpiinv", rehearsal["root"], "rgb", rehearsal["subjects"],
        camera_tag="all", seed=SEED, pairing="reference", pair_rng=pair_rng,
    )
    assert ours_test.idx_to_kv == rehearsal["ref_test_index"]

    cfg = SimpleNamespace(
        mode="test", exp_name="rehearsal",
        output_dir=str(tmp_path / "logs"), ckpt_resume=rehearsal["ckpt"],
        print_freq=10**9, seed=SEED, batch_size=BATCH,
        test_batch_size=BATCH, epochs=1, save_epoch=10**9,
        image_size=IMAGE_SIZE, scheduler_step="epoch",
    )
    model = FeatRotationSymm(**MODEL_CFG)
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
    print(f"reference: {rehearsal['ref_error']:.4f} deg  "
          f"ours: {our_error:.4f} deg  delta: {delta:.4f} deg")
    assert delta <= 0.1, (
        f"protocol parity violated: reference {rehearsal['ref_error']:.4f} "
        f"vs ours {our_error:.4f} deg (delta {delta:.4f} > 0.1)"
    )
