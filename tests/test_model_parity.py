"""Numerical parity: flax FeatRotationSymm + torch->JAX converter vs the
reference torch model executed as a golden oracle.

This is the ≤0.1° checkpoint-parity derisking test (SURVEY.md §7 step 2): a
randomly-initialized reference model's state dict is converted with
``convert_rot_mv_state_dict`` and both models are run on identical inputs in
eval mode; gaze outputs must match to float32 tolerance.
"""

import numpy as np
import pytest

from reference_harness import import_reference_models, reference_available
from rot_mvgaze_tpu.compat import (
    convert_rot_mv_state_dict,
    flax_to_torch_state_dict,
)
from rot_mvgaze_tpu.compat.torch_convert import check_conversion_coverage
from rot_mvgaze_tpu.models import FeatRotationSymm

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)


def _make_inputs(batch=3, size=64, seed=0):
    rng = np.random.RandomState(seed)
    img_0 = rng.randn(batch, 3, size, size).astype(np.float32)
    img_1 = rng.randn(batch, 3, size, size).astype(np.float32)
    hp_0 = rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32)
    hp_1 = rng.uniform(-0.8, 0.8, (batch, 2)).astype(np.float32)
    return img_0, img_1, hp_0, hp_1


def _run_reference(config, img_0, img_1, rot_0, rot_1, train=False):
    import torch

    ref_rot_mv, _ = import_reference_models()
    torch.manual_seed(0)
    model = ref_rot_mv.FeatRotationSymm(**config)
    model.train(train)
    data = {
        "img_0": torch.from_numpy(img_0),
        "img_1": torch.from_numpy(img_1),
        "rot_0": torch.from_numpy(rot_0),
        "rot_1": torch.from_numpy(rot_1),
    }
    with torch.no_grad():
        out = model(data)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, sd, out


def _run_ours(config, sd, img_0, img_1, rot_0, rot_1):
    import jax

    variables = convert_rot_mv_state_dict(sd, **config)
    variables = jax.tree.map(lambda x: np.asarray(x, np.float32), variables)
    model = FeatRotationSymm(**config)
    data = {
        # torch NCHW -> our NHWC
        "img_0": np.transpose(img_0, (0, 2, 3, 1)),
        "img_1": np.transpose(img_1, (0, 2, 3, 1)),
        "rot_0": rot_0,
        "rot_1": rot_1,
    }
    return model.apply(variables, data, train=False)


def _rotmats(hp):
    import torch

    import rot_mvgaze_tpu.geometry as geo

    return np.asarray(geo.rotation_matrix_2d(hp), np.float32)


CONFIGS = [
    pytest.param(dict(backbone_depth=18, num_iter=2), id="r18-default"),
    pytest.param(
        dict(backbone_depth=18, num_iter=2, encode_rotmat=True), id="r18-encode"
    ),
    pytest.param(
        dict(backbone_depth=18, num_iter=2, ignore_rotmat=True), id="r18-ignore"
    ),
    pytest.param(
        dict(backbone_depth=18, num_iter=2, share_feature=True), id="r18-sharefeat"
    ),
    pytest.param(
        dict(backbone_depth=18, num_iter=2, share_weights=True), id="r18-sharew"
    ),
    pytest.param(
        # share_feature + ignore_rotmat compose in the reference: the
        # forward branches on ignore_rotmat BEFORE the rotating else-branch
        # (/root/reference/models/rot_mv.py:226-232), so the RotFeatFuser
        # consumes the UN-rotated partner feature (r4 review finding).
        dict(
            backbone_depth=18, num_iter=2,
            share_feature=True, ignore_rotmat=True,
        ),
        id="r18-sharefeat-ignore",
    ),
    pytest.param(dict(backbone_depth=50, num_iter=3), id="r50-default-shipped"),
]


@pytest.mark.parametrize("config", CONFIGS)
def test_eval_parity(config):
    img_0, img_1, hp_0, hp_1 = _make_inputs()
    rot_0, rot_1 = _rotmats(hp_0), _rotmats(hp_1)

    _, sd, ref_out = _run_reference(config, img_0, img_1, rot_0, rot_1)
    assert check_conversion_coverage(sd, **config) == []

    out = _run_ours(config, sd, img_0, img_1, rot_0, rot_1)

    np.testing.assert_allclose(
        np.asarray(out["pred_gaze"]),
        ref_out["pred_gaze"].numpy(),
        atol=2e-4,
        rtol=1e-3,
    )
    # every iteration's gaze heads, both views
    n_iter = config["num_iter"]
    for i in range(n_iter):
        for v in (0, 1):
            np.testing.assert_allclose(
                np.asarray(out[f"iter_{i}"][f"pred_gaze_{v}"]),
                ref_out[f"iter_{i}"][f"pred_gaze_{v}"].numpy(),
                atol=2e-4,
                rtol=1e-3,
                err_msg=f"iter_{i} pred_gaze_{v}",
            )


def test_backbone_feature_parity():
    """Intermediate check: backbone pooled features match closely."""
    config = dict(backbone_depth=18, num_iter=1)
    img_0, img_1, hp_0, hp_1 = _make_inputs()
    rot_0, rot_1 = _rotmats(hp_0), _rotmats(hp_1)
    _, sd, ref_out = _run_reference(config, img_0, img_1, rot_0, rot_1)
    out = _run_ours(config, sd, img_0, img_1, rot_0, rot_1)
    for k in ("img_feat_0", "img_feat_1", "initial_rot_feat_0", "initial_rot_feat_1"):
        np.testing.assert_allclose(
            np.asarray(out[k]), ref_out[k].numpy(), atol=1e-4, rtol=1e-3, err_msg=k
        )


def test_round_trip_state_dict():
    """flax -> torch -> flax conversion is the identity."""
    import jax

    config = dict(backbone_depth=18, num_iter=2)
    img_0, img_1, hp_0, hp_1 = _make_inputs(batch=1, size=32)
    rot_0, rot_1 = _rotmats(hp_0), _rotmats(hp_1)
    _, sd, _ = _run_reference(config, img_0, img_1, rot_0, rot_1)

    variables = convert_rot_mv_state_dict(sd, **config)
    sd_back = flax_to_torch_state_dict(variables, **config)
    for k, v in sd_back.items():
        np.testing.assert_array_equal(v, sd[k], err_msg=k)


def test_strict_export_loads_in_reference():
    """strict_compatible export must satisfy the reference's
    load_state_dict(strict=True) — the interop direction ours -> theirs."""
    import torch

    from reference_harness import import_reference_models

    ref_rot_mv, _ = import_reference_models()
    config = dict(backbone_depth=18, num_iter=2)
    img_0, img_1, hp_0, hp_1 = _make_inputs(batch=1, size=32)
    rot_0, rot_1 = _rotmats(hp_0), _rotmats(hp_1)
    _, sd, _ = _run_reference(config, img_0, img_1, rot_0, rot_1)

    variables = convert_rot_mv_state_dict(sd, **config)
    sd_back = flax_to_torch_state_dict(variables, strict_compatible=True, **config)

    torch.manual_seed(0)
    model = ref_rot_mv.FeatRotationSymm(
        share_weights=False, encode_rotmat=False,
        share_feature=False, ignore_rotmat=False, **config,
    )
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_back.items()},
        strict=True,
    )


def test_pretrained_backbone_init():
    """torchvision-format ResNet ckpt initializes the backbone: pooled
    features must match the reference ResNet on the same input."""
    import torch

    from reference_harness import import_reference_models
    from rot_mvgaze_tpu.compat import load_pretrained_backbone
    import jax

    _, ref_resnet = import_reference_models()
    torch.manual_seed(0)
    ref = ref_resnet.resnet18(pretrained=False)
    ref.eval()
    sd = ref.state_dict()

    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "r18.pth")
    torch.save(sd, path)

    model = FeatRotationSymm(backbone_depth=18, num_iter=1)
    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 64, 64).astype(np.float32)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3))
    data = {
        "img_0": np.transpose(img, (0, 2, 3, 1)),
        "img_1": np.transpose(img, (0, 2, 3, 1)),
        "rot_0": eye,
        "rot_1": eye,
    }
    variables = model.init({"params": __import__("jax").random.PRNGKey(0)}, data)
    variables = load_pretrained_backbone(jax.device_get(variables), path, 18)
    variables = jax.tree.map(np.asarray, variables)
    out = model.apply(variables, data, train=False)

    with torch.no_grad():
        want = ref(torch.from_numpy(img)).flatten(1).numpy()
    np.testing.assert_allclose(
        np.asarray(out["img_feat_0"]), want, atol=1e-4, rtol=1e-3
    )


def test_bn_running_stats_parity_after_train_steps():
    """Default-path BN must track torch BatchNorm2d's running stats: torch
    normalizes with the biased batch variance but stores the UNBIASED one in
    running_var (Bessel correction) — flax nn.BatchNorm stores the biased
    variance, which this repo's TorchBatchNorm corrects (VERDICT r1 item 4)."""
    import jax
    import torch

    ref_rot_mv, _ = import_reference_models()
    config = dict(backbone_depth=18, num_iter=1)
    torch.manual_seed(0)
    ref = ref_rot_mv.FeatRotationSymm(**config)
    # copy(): state_dict tensors alias the live buffers, which torch's later
    # train-mode forwards mutate in place (running stats).
    sd0 = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    variables = jax.tree.map(
        lambda x: np.asarray(x, np.float32),
        convert_rot_mv_state_dict(sd0, **config),
    )
    model = FeatRotationSymm(**config)
    params, batch_stats = variables["params"], variables["batch_stats"]

    ref.train(True)
    for step in range(3):
        img_0, img_1, hp_0, hp_1 = _make_inputs(batch=4, size=64, seed=10 + step)
        rot_0, rot_1 = _rotmats(hp_0), _rotmats(hp_1)
        with torch.no_grad():
            ref(
                {
                    "img_0": torch.from_numpy(img_0),
                    "img_1": torch.from_numpy(img_1),
                    "rot_0": torch.from_numpy(rot_0),
                    "rot_1": torch.from_numpy(rot_1),
                }
            )
        data = {
            "img_0": np.transpose(img_0, (0, 2, 3, 1)),
            "img_1": np.transpose(img_1, (0, 2, 3, 1)),
            "rot_0": rot_0,
            "rot_1": rot_1,
        }
        # Batch stats feed back into the NEXT step's normalization, so conv
        # rounding compounds across steps: pin convs to f32 accumulation
        # (XLA's default CPU/TPU conv precision is lower than torch's f32).
        with jax.default_matmul_precision("highest"):
            _, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                data,
                train=True,
                mutable=["batch_stats"],
            )
        batch_stats = updates["batch_stats"]

    sd_ref = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd_ours = flax_to_torch_state_dict(
        {"params": params, "batch_stats": jax.device_get(batch_stats)}, **config
    )
    checked = 0
    for k, want in sd_ref.items():
        if k.endswith(("running_mean", "running_var")):
            np.testing.assert_allclose(
                sd_ours[k], want, atol=2e-4, rtol=2e-4, err_msg=k
            )
            checked += 1
    assert checked > 20  # every BN in the twin-R18 + heads


def test_intensity_bn_running_std_parity_after_train_steps():
    """share_feature path: IntensityBatchNorm's running-std buffer (momentum
    0.05, updated BEFORE the division, /root/reference/models/rot_mv.py:13-32)
    must track torch's across train-mode forwards."""
    import jax
    import torch

    ref_rot_mv, _ = import_reference_models()
    config = dict(backbone_depth=18, num_iter=2, share_feature=True)
    torch.manual_seed(0)
    ref = ref_rot_mv.FeatRotationSymm(
        share_weights=False, encode_rotmat=False, ignore_rotmat=False, **config
    )
    sd0 = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    variables = jax.tree.map(
        lambda x: np.asarray(x, np.float32),
        convert_rot_mv_state_dict(sd0, **config),
    )
    model = FeatRotationSymm(**config)
    params, batch_stats = variables["params"], variables["batch_stats"]

    ref.train(True)
    for step in range(3):
        img_0, img_1, hp_0, hp_1 = _make_inputs(batch=4, size=64, seed=20 + step)
        rot_0, rot_1 = _rotmats(hp_0), _rotmats(hp_1)
        with torch.no_grad():
            ref(
                {
                    "img_0": torch.from_numpy(img_0.copy()),
                    "img_1": torch.from_numpy(img_1.copy()),
                    "rot_0": torch.from_numpy(rot_0.copy()),
                    "rot_1": torch.from_numpy(rot_1.copy()),
                }
            )
        data = {
            "img_0": np.transpose(img_0, (0, 2, 3, 1)),
            "img_1": np.transpose(img_1, (0, 2, 3, 1)),
            "rot_0": rot_0,
            "rot_1": rot_1,
        }
        with jax.default_matmul_precision("highest"):
            _, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                data,
                train=True,
                mutable=["batch_stats"],
            )
        batch_stats = updates["batch_stats"]

    sd_ref = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd_ours = flax_to_torch_state_dict(
        {"params": params, "batch_stats": jax.device_get(batch_stats)}, **config
    )
    keys = [k for k in sd_ref if k.endswith("_batchnorm.running_mean")]
    assert keys, list(sd_ref)[:5]
    for k in keys:
        np.testing.assert_allclose(
            sd_ours[k], sd_ref[k], atol=2e-4, rtol=2e-3, err_msg=k
        )


def test_north_star_angular_delta():
    """BASELINE north star: converted-checkpoint outputs must be within
    0.1 deg angular error of the reference's, sample-by-sample."""
    from rot_mvgaze_tpu.geometry import angular_error_numpy

    config = dict(backbone_depth=50, num_iter=3)
    img_0, img_1, hp_0, hp_1 = _make_inputs(batch=4, size=64, seed=3)
    rot_0, rot_1 = _rotmats(hp_0), _rotmats(hp_1)
    _, sd, ref_out = _run_reference(config, img_0, img_1, rot_0, rot_1)
    out = _run_ours(config, sd, img_0, img_1, rot_0, rot_1)
    delta = angular_error_numpy(
        np.asarray(out["pred_gaze"], np.float64),
        ref_out["pred_gaze"].numpy().astype(np.float64),
    )
    assert float(delta.max()) < 0.1, delta


def test_share_weights_deduplicated_checkpoint_converts():
    """A share_weights checkpoint whose aliased ModuleList duplicates were
    deduplicated (e.g. saved via named_parameters) must still convert: the
    canonical entry supplies every shared flax path."""
    from rot_mvgaze_tpu.compat.torch_convert import (
        convert_rot_mv_state_dict,
        rot_mv_entries,
    )

    config = dict(backbone_depth=18, num_iter=2, share_weights=True)
    img_0, img_1, hp_0, hp_1 = _make_inputs(batch=1, size=32)
    rot_0, rot_1 = _rotmats(hp_0), _rotmats(hp_1)
    _, sd, _ = _run_reference(config, img_0, img_1, rot_0, rot_1)

    full = convert_rot_mv_state_dict(sd, **config)

    # drop every aliased duplicate's keys from the state dict
    aliased_prefixes = [
        e.torch_key for e in rot_mv_entries(**config) if e.alias_of
    ]
    dedup = {
        k: v
        for k, v in sd.items()
        if not any(k.startswith(p + ".") for p in aliased_prefixes)
    }
    assert len(dedup) < len(sd)
    converted = convert_rot_mv_state_dict(dedup, **config)
    import jax as _jax

    _jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), full, converted
    )
