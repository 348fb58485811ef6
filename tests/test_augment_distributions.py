"""Quantitative augmentation parity (VERDICT r1 item 5).

Train-time augmentation is stochastic, so parity is DISTRIBUTIONAL, not
bitwise: these tests compare our PRNG-keyed jit ops against the reference's
``RandomMultiErasing`` executed as a torch oracle
(/root/reference/utils/augment.py:10-47) and against torchvision's documented
ColorJitter/RandomAffine semantics (/root/reference/main.py:41-49),
including the PIL-uint8 quantization question. Statistics use a two-sample
Kolmogorov–Smirnov test implemented inline (no scipy in this image).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rot_mvgaze_tpu.augment.ops import (
    _affine_warp_nearest,
    color_jitter,
    random_affine,
    random_multi_erasing,
)

torch = pytest.importorskip("torch")


def ks_statistic(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample KS statistic: sup |F_a - F_b|."""
    a, b = np.sort(a), np.sort(b)
    allv = np.concatenate([a, b])
    fa = np.searchsorted(a, allv, side="right") / len(a)
    fb = np.searchsorted(b, allv, side="right") / len(b)
    return float(np.abs(fa - fb).max())


def ks_threshold(n: int, m: int, alpha_coeff: float = 1.63) -> float:
    """KS critical value; 1.63 ~ alpha=0.01."""
    return alpha_coeff * np.sqrt((n + m) / (n * m))


# ---------------------------------------------------------------------------
# RandomMultiErasing vs the reference torch oracle
# ---------------------------------------------------------------------------

N = 400
SIZE = 112  # divisible-enough image size, keeps the oracle loop fast


def _ref_erasing_samples(n, size, seed=0):
    """Erased fraction + inferred grid size per applied reference sample."""
    from reference_harness import import_reference_augment

    ref_augment = import_reference_augment()
    torch.manual_seed(seed)
    np.random.seed(seed)
    re = ref_augment.RandomMultiErasing(
        proportion=[0.5, 0.6], p=1.1, dot_size=[0.05, 0.3]  # p>1: always on
    )
    fracs, grids = [], []
    for _ in range(n):
        img = torch.ones(3, size, size)
        out = re(img)
        m = out[0].numpy()  # mask-multiplied ones == the mask itself
        fracs.append(float((m == 0).mean()))
        # infer hs from the row-boundary structure: nearest upsample of an
        # hs-cell grid changes value only at cell edges
        row_changes = (np.diff(m, axis=1) != 0).any(axis=0).sum()
        grids.append(row_changes)
    return np.asarray(fracs), np.asarray(grids)


def _our_erasing_samples(n, size, seed=0):
    imgs = jnp.ones((n, size, size, 3), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    out = jax.vmap(lambda k, im: random_multi_erasing(k, im, p=1.0))(keys, imgs)
    m = np.asarray(out)[..., 0]
    fracs = (m == 0).mean(axis=(1, 2))
    grids = np.asarray(
        [(np.diff(mm, axis=1) != 0).any(axis=0).sum() for mm in m]
    )
    return fracs, grids


class TestMultiErasingDistributions:
    @pytest.fixture(scope="class")
    def samples(self):
        return _ref_erasing_samples(N, SIZE), _our_erasing_samples(N, SIZE)

    def test_erased_fraction_distribution(self, samples):
        (ref_f, _), (our_f, _) = samples
        # Means: erased fraction ~ proportion ~ U[0.5, 0.6] -> mean ~0.55
        assert abs(ref_f.mean() - our_f.mean()) < 0.02, (
            ref_f.mean(), our_f.mean(),
        )
        ks = ks_statistic(ref_f, our_f)
        assert ks < ks_threshold(N, N), f"KS={ks}"

    def test_cell_count_distribution(self, samples):
        """hs = int(1/dot), dot ~ U[0.05, 0.3] -> hs in [3, 20]; the count of
        mask column-boundaries tracks hs. Distributions must agree."""
        (_, ref_g), (_, our_g) = samples
        ks = ks_statistic(ref_g.astype(float), our_g.astype(float))
        assert ks < ks_threshold(N, N), f"KS={ks}"

    def test_gate_rate(self):
        """p=0.5 gate: close to half of samples pass through unmodified."""
        n = 600
        imgs = jnp.ones((n, 32, 32, 3), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(3), n)
        out = jax.vmap(lambda k, im: random_multi_erasing(k, im, p=0.5))(
            keys, imgs
        )
        applied = (np.asarray(out)[..., 0] == 0).any(axis=(1, 2))
        rate = applied.mean()
        assert 0.42 < rate < 0.58, rate


# ---------------------------------------------------------------------------
# ColorJitter vs torchvision's documented float semantics
# ---------------------------------------------------------------------------


def _torch_jitter_once(img_chw: torch.Tensor, gen: torch.Generator):
    """torchvision ColorJitter(brightness=1.0, contrast=0.1, saturation=0.1)
    float-tensor semantics: factors ~ U[max(0,1-x), 1+x], random op order,
    blend(a, b, f) = clamp(f*a + (1-f)*b)."""

    def blend(a, b, f):
        return (f * a + (1.0 - f) * b).clamp(0.0, 1.0)

    def gray(x):
        w = torch.tensor([0.299, 0.587, 0.114])
        return (x * w.view(3, 1, 1)).sum(0, keepdim=True)

    def u(lo, hi):
        return (lo + (hi - lo) * torch.rand(1, generator=gen)).item()

    fb, fc, fs = u(0.0, 2.0), u(0.9, 1.1), u(0.9, 1.1)
    order = torch.randperm(3, generator=gen).tolist()
    x = img_chw
    for op in order:
        if op == 0:
            x = blend(x, torch.zeros_like(x), fb)
        elif op == 1:
            x = blend(x, gray(x).mean(), fc)
        else:
            x = blend(x, gray(x).expand_as(x), fs)
    return x


class TestColorJitterDistribution:
    def test_output_mean_distribution_matches_torchvision_semantics(self):
        n = 400
        rng = np.random.RandomState(0)
        base = rng.rand(3, 32, 32).astype(np.float32)
        gen = torch.Generator().manual_seed(0)
        ref_means = np.asarray(
            [
                _torch_jitter_once(torch.from_numpy(base), gen).mean().item()
                for _ in range(n)
            ]
        )
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        imgs = jnp.broadcast_to(
            jnp.asarray(np.transpose(base, (1, 2, 0))), (n, 32, 32, 3)
        )
        ours = jax.vmap(color_jitter)(keys, imgs)
        our_means = np.asarray(ours).mean(axis=(1, 2, 3))
        ks = ks_statistic(ref_means, our_means)
        assert ks < ks_threshold(n, n), f"KS={ks}"

    def test_uint8_quantization_bound(self):
        """The reference jitters PIL uint8 images (quantizing after each op);
        we jitter in float. Per-op quantization error is <= 1/255 zero-mean —
        bound the end-to-end deviation of the two pipelines."""
        n = 100
        rng = np.random.RandomState(2)
        base = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        keys = jax.random.split(jax.random.PRNGKey(4), n)
        img_f = jnp.asarray(base, jnp.float32) / 255.0
        float_out = jax.vmap(lambda k: color_jitter(k, img_f))(keys)

        def jitter_u8(key, img):
            """Same sampled factors, but re-quantize to uint8 after each op
            (PIL pipeline simulation)."""
            k_perm, k_b, k_c, k_s = jax.random.split(key, 4)
            factors = jnp.stack(
                [
                    jax.random.uniform(k_b, (), minval=0.0, maxval=2.0),
                    jax.random.uniform(k_c, (), minval=0.9, maxval=1.1),
                    jax.random.uniform(k_s, (), minval=0.9, maxval=1.1),
                ]
            )
            order = jax.random.permutation(k_perm, 3)
            from rot_mvgaze_tpu.augment.ops import _jitter_one

            x = img
            for i in range(3):
                op = order[i]
                x = _jitter_one(x, op, factors[op])
                x = jnp.round(x * 255.0) / 255.0  # uint8 quantization
            return x

        u8_out = jax.vmap(lambda k: jitter_u8(k, img_f))(keys)
        diff = np.abs(np.asarray(float_out) - np.asarray(u8_out))
        assert diff.mean() < 2.0 / 255.0, diff.mean()
        assert diff.max() < 8.0 / 255.0, diff.max()


# ---------------------------------------------------------------------------
# RandomAffine vs PIL/torchvision nearest-resample semantics
# ---------------------------------------------------------------------------


def _pil_affine_nearest(img_hwc: np.ndarray, scale, tx, ty) -> np.ndarray:
    """Oracle: PIL Image.transform(AFFINE, nearest) as torchvision's
    RandomAffine drives it — inverse matrix about center (w/2, h/2), output
    coords offset by +0.5, source floored, OOB filled 0."""
    h, w = img_hwc.shape[:2]
    cx, cy = w * 0.5, h * 0.5
    out = np.zeros_like(img_hwc)
    ys, xs = np.mgrid[0:h, 0:w]
    sx = np.floor((xs + 0.5 - cx - tx) / scale + cx).astype(int)
    sy = np.floor((ys + 0.5 - cy - ty) / scale + cy).astype(int)
    ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    out[ok] = img_hwc[sy[ok], sx[ok]]
    return out


class TestAffineSemantics:
    def test_warp_matches_pil_nearest_oracle(self):
        rng = np.random.RandomState(1)
        img = rng.rand(64, 64, 3).astype(np.float32)
        mismatch_total = 0
        for scale, tx, ty in [
            (1.0, 1.0, -1.0),
            (0.99, 0.0, 0.0),
            (1.01, -1.0, 1.0),
            (0.993, 1.0, 0.0),
            (1.007, -1.0, -1.0),
        ]:
            want = _pil_affine_nearest(img, scale, tx, ty)
            got = np.asarray(
                _affine_warp_nearest(
                    jnp.asarray(img),
                    jnp.float32(scale),
                    jnp.float32(tx),
                    jnp.float32(ty),
                )
            )
            # identical up to round-half ties on exact cell boundaries
            mismatch = (np.abs(got - want).max(axis=-1) > 1e-6).mean()
            mismatch_total += mismatch
            assert mismatch < 0.05, (scale, tx, ty, mismatch)
        assert mismatch_total / 5 < 0.02

    def test_translate_draws_are_integer_pixels(self):
        """torchvision RandomAffine.get_params rounds translations to whole
        pixels; the warp must therefore be a pure pixel shift at scale=1."""
        img = np.zeros((32, 32, 3), np.float32)
        img[10, 10] = 1.0
        hits = 0
        for i in range(50):
            out = np.asarray(
                random_affine(
                    jax.random.PRNGKey(i),
                    jnp.asarray(img),
                    scale_range=(1.0, 1.0),
                    translate=(0.05, 0.05),
                )
            )
            yy, xx = np.argwhere(out[..., 0] == 1.0)[0]
            assert out[yy, xx, 0] == 1.0  # never blurred/attenuated
            hits += 1
        assert hits == 50
