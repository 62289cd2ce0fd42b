"""Kornia-exact numpy oracles for every intensity op in the training stack.

The reference applies kornia augmentations on device
(`datatransformation/batch/intensity.py:30-64`, configured in
`pipelines.py:508-528`). Each op's public kornia formula is implemented here
as an independent numpy oracle and the device implementation
(`augmentation/intensity.py`) is asserted to match within float tolerance on
random images — a systematic brightness/gamma/binning bias can no longer
change training statistics silently.

Oracle sources (public kornia semantics):
 - equalize: float path scales to [0,255], torch.histc(256,0,255) (bin width
   255/256 -> index floor(x*256)), torchvision LUT with floored half-step,
   lookup via .long() truncation (floor(x*255)).
 - posterize: (x*255).to(uint8), keep top `bits` bits, /255; bits drawn by
   truncating uniform(4,6) to int32.
 - gamma: pow(x, gamma), gain 1, no clamp.
 - contrast: x*factor clamped to [0,1] (clip_output=True).
 - brightness: x + (factor-1) clamped to [0,1].
 - gaussian blur 5x5 sigma 1.5: separable exp(-x^2/2s^2) kernel, normalized,
   reflect padding.
 - gaussian noise: x + N(0, std^2), no intermediate clip; final OnlyClip.

Sampling scheme: the batch-level random_apply=4 subset + random op order is
implemented faithfully (`intensity_augmentation_stage1` draws a random 4-op
subset in random order per batch, `lax.switch` under `fori_loop`); the one
remaining deviation (documented in docs/MIGRATION.md) is that the stacked
noise layers are drawn as one gaussian of combined variance (statistically
identical).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.augmentation import intensity as I


@pytest.fixture
def images(rng):
    x = rng.rand(4, 33, 29, 1).astype(np.float32)
    # Include exact 0/1 pixels and uint8-grid values (the common real case).
    x[0] = np.round(x[0] * 255.0) / 255.0
    x[1, :4] = 0.0
    x[1, 4:8] = 1.0
    return x


# ------------------------------------------------------------------ oracles


def kornia_equalize_np(img):
    """img (H, W) float [0,1] -> equalized, kornia float path."""
    im = img.astype(np.float64) * 255.0
    # torch.histc(im, 256, 0, 255): bin width 255/256; values == max go last.
    hist_idx = np.clip(np.floor(im * 256.0 / 255.0), 0, 255).astype(np.int64)
    histo = np.bincount(hist_idx.ravel(), minlength=256).astype(np.float64)
    nonzero = histo[histo != 0]
    step = np.floor((nonzero.sum() - nonzero[-1]) / 255.0) if nonzero.size else 0.0
    if step == 0:
        return (im / 255.0).astype(np.float32)
    lut = np.floor((np.cumsum(histo) + np.floor(step / 2.0)) / step)
    lut = np.clip(np.concatenate([[0.0], lut[:-1]]), 0, 255)
    res = lut[im.astype(np.int64)]  # .long() truncation
    return (res / 255.0).astype(np.float32)


def kornia_posterize_np(img, bits):
    x = (img * 255.0).astype(np.uint8)
    mask = np.uint8(0xFF & ~(2 ** (8 - bits) - 1))
    return (x & mask).astype(np.float32) / 255.0


def kornia_gamma_np(img, gamma):
    return np.power(img, gamma)


def kornia_contrast_np(img, factor):
    return np.clip(img * factor, 0.0, 1.0)


def kornia_brightness_np(img, factor):
    return np.clip(img + (factor - 1.0), 0.0, 1.0)


def kornia_gaussian_blur_np(img, ksize=5, sigma=1.5):
    """img (H, W) -> separable blur, reflect padding."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    pad = ksize // 2
    p = np.pad(img.astype(np.float64), pad, mode="reflect")
    tmp = np.zeros((img.shape[0], p.shape[1]))
    for i in range(img.shape[0]):
        for j in range(p.shape[1]):
            tmp[i, j] = np.dot(k, p[i : i + ksize, j])
    out = np.zeros(img.shape)
    for i in range(img.shape[0]):
        for j in range(img.shape[1]):
            out[i, j] = np.dot(k, tmp[i, j : j + ksize])
    return out.astype(np.float32)


# -------------------------------------------------------------------- tests


def test_equalize_matches_kornia(images):
    ours = np.asarray(I.equalize(jnp.asarray(images)))
    for b in range(images.shape[0]):
        want = kornia_equalize_np(images[b, :, :, 0])
        np.testing.assert_allclose(ours[b, :, :, 0], want, atol=1e-5, err_msg=f"sample {b}")


def test_equalize_multichannel_is_per_channel(rng):
    x = rng.rand(2, 17, 19, 3).astype(np.float32)
    ours = np.asarray(I.equalize(jnp.asarray(x)))
    for b in range(2):
        for c in range(3):
            want = kornia_equalize_np(x[b, :, :, c])
            np.testing.assert_allclose(ours[b, :, :, c], want, atol=1e-5)


def test_posterize_matches_kornia(images):
    for bits in (4, 5, 6):
        ours = np.asarray(I.posterize(jnp.asarray(images), jnp.full((4,), bits)))
        want = kornia_posterize_np(images, bits)
        np.testing.assert_allclose(ours, want, atol=1e-7, err_msg=f"bits={bits}")


def test_gamma_matches_kornia(images, rng):
    g = rng.uniform(0.5, 2.0, (4,)).astype(np.float32)
    ours = np.asarray(I.adjust_gamma(jnp.asarray(images), jnp.asarray(g)))
    for b in range(4):
        np.testing.assert_allclose(
            ours[b], kornia_gamma_np(images[b], g[b]), atol=1e-6, err_msg=f"sample {b}"
        )


def test_contrast_matches_kornia(images, rng):
    f = rng.uniform(0.7, 1.5, (4,)).astype(np.float32)
    ours = np.asarray(I.adjust_contrast(jnp.asarray(images), jnp.asarray(f)))
    for b in range(4):
        np.testing.assert_allclose(
            ours[b], kornia_contrast_np(images[b], f[b]), atol=1e-6, err_msg=f"sample {b}"
        )


def test_brightness_matches_kornia(images, rng):
    f = rng.uniform(0.7, 1.5, (4,)).astype(np.float32)
    ours = np.asarray(I.adjust_brightness(jnp.asarray(images), jnp.asarray(f)))
    for b in range(4):
        np.testing.assert_allclose(
            ours[b], kornia_brightness_np(images[b], f[b]), atol=1e-6, err_msg=f"sample {b}"
        )


def test_gaussian_blur_matches_kornia(images):
    ours = np.asarray(I.gaussian_blur(jnp.asarray(images), 5, 1.5))
    for b in range(4):
        want = kornia_gaussian_blur_np(images[b, :, :, 0])
        np.testing.assert_allclose(ours[b, :, :, 0], want, atol=1e-5, err_msg=f"sample {b}")


def test_posterize_bits_distribution():
    """Bits follow kornia's int32-truncated uniform(4, 6): {4, 5} only."""
    key = jax.random.PRNGKey(0)
    bits = jnp.floor(jax.random.uniform(key, (4000,), minval=4.0, maxval=6.0)).astype(jnp.int32)
    vals, counts = np.unique(np.asarray(bits), return_counts=True)
    assert set(vals.tolist()) <= {4, 5}
    assert abs(counts[0] / 4000 - 0.5) < 0.05


def test_noise_statistics(rng):
    """Combined-variance single draw == stacked kornia RandomGaussianNoise:
    per-sigma application rate and the resulting marginal std both match."""
    B = 4096
    x = jnp.full((B, 4, 4, 1), 0.5)
    out = np.asarray(I.intensity_augmentation_noise(jax.random.PRNGKey(3), x))
    delta = out[:, 0, 0, 0] - 0.5
    # P(no noise at all) = prod(1 - 0.25^k) ~ 0.6869 -> ~31% of samples noisy.
    frac_noisy = np.mean(np.abs(delta) > 1e-9)
    assert abs(frac_noisy - (1 - 0.75 * (1 - 0.25**2) * (1 - 0.25**3) * (1 - 0.25**4))) < 0.03
    # Marginal variance of the noisy mixture (before clipping dominates):
    # E[sum applied sigma_k^2] / P(any) -- check std within 20%.
    sigmas = np.asarray([4.0, 16.0, 32.0, 64.0]) / 255.0
    probs = np.asarray([0.25, 0.25**2, 0.25**3, 0.25**4])
    expected_var = np.sum(probs * sigmas**2) / frac_noisy
    measured = np.mean(delta[np.abs(delta) > 1e-9] ** 2)
    assert 0.5 * expected_var < measured < 1.6 * expected_var
