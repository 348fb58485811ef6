"""Resize parity for non-224 inputs (VERDICT r1 item 3).

The reference eval transform is ToTensor -> Resize(224, antialias=True) ->
Normalize (/root/reference/main.py:51-56). On the tensor path torchvision's
Resize lowers to F.interpolate(mode="bilinear", antialias=True), so if
MPII-NV patches were stored at a size != 224 this resize would land directly
in the eval metric. These goldens pin our ``resize_bilinear`` /
``eval_preprocess`` to torch's implementation across down- and up-scales.
"""

import numpy as np
import pytest

from rot_mvgaze_tpu.augment.ops import eval_preprocess, resize_bilinear

torch = pytest.importorskip("torch")


def _torch_resize(x_chw: np.ndarray, size: int) -> np.ndarray:
    """torchvision Resize(size, antialias=True) tensor-path semantics."""
    return torch.nn.functional.interpolate(
        torch.from_numpy(x_chw)[None],
        size=(size, size),
        mode="bilinear",
        align_corners=False,
        antialias=True,
    )[0].numpy()


@pytest.mark.parametrize("src", [448, 336, 250, 224, 160, 129])
def test_resize_matches_torch_antialias_bilinear(src):
    rng = np.random.RandomState(src)
    x = rng.rand(3, src, src).astype(np.float32)
    want = _torch_resize(x, 224)
    got = np.transpose(
        np.asarray(resize_bilinear(np.transpose(x, (1, 2, 0)), 224)), (2, 0, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("src", [448, 250, 129])
def test_eval_preprocess_matches_reference_transform_nonsquare_size(src):
    """Full eval stack on uint8 input at a non-224 stored size must match
    ToTensor -> Resize(224, antialias) -> Normalize(ImageNet) exactly
    (/root/reference/main.py:51-56, dataset/gaze.py:106-111)."""
    rng = np.random.RandomState(src)
    img_u8 = rng.randint(0, 256, (2, src, src, 3), dtype=np.uint8)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    want = []
    for im in img_u8:
        t = torch.from_numpy(np.transpose(im, (2, 0, 1))).float() / 255.0
        t = torch.from_numpy(_torch_resize(t.numpy(), 224))
        want.append(((t - mean) / std).numpy())
    want = np.stack(want)

    got = np.transpose(np.asarray(eval_preprocess(img_u8, 224)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resize_identity_at_224():
    """Stored-at-224 inputs (XGaze) must pass through bit-exactly."""
    rng = np.random.RandomState(0)
    x = rng.rand(224, 224, 3).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize_bilinear(x, 224)), x)
