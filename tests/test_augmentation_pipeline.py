"""Fused train augmentation pipeline + intensity ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.augmentation import intensity
from neuralnet_tracker_traincode_tpu.augmentation.pipeline import (
    TrainAugmentationConfig,
    augment_batch_for_training,
    crop_for_eval,
)
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory
from neuralnet_tracker_traincode_tpu.ops.mathfn import affinevecmul


def _make_batch(rng, B=4, size=96):
    images = (rng.rand(B, size, size, 1) * 255).astype(np.uint8)
    roi = np.tile(np.asarray([20.0, 20.0, 70.0, 70.0], np.float32), (B, 1))
    labels = {
        "roi": jnp.asarray(roi),
        "pose": jnp.asarray(np.tile([0.0, 0, 0, 1], (B, 1)).astype(np.float32)),
        "coord": jnp.asarray(rng.rand(B, 3).astype(np.float32) * 40 + 20),
        "pt3d_68": jnp.asarray(rng.rand(B, 68, 3).astype(np.float32) * 50 + 20),
    }
    categories = {
        "roi": FieldCategory.roi,
        "pose": FieldCategory.quat,
        "coord": FieldCategory.xys,
        "pt3d_68": FieldCategory.points,
    }
    return jnp.asarray(images), labels, categories


def test_pipeline_shapes_and_ranges(rng):
    images, labels, categories = _make_batch(rng)
    cfg = TrainAugmentationConfig(inputsize=129)
    key = jax.random.PRNGKey(0)
    x, out = jax.jit(
        lambda k, im, lb: augment_batch_for_training(k, im, lb, categories, cfg)
    )(key, images, labels)
    assert x.shape == (4, 129, 129, 1)
    assert x.dtype == jnp.float32
    xv = np.asarray(x)
    assert xv.min() >= -0.5 - 1e-6 and xv.max() <= 0.5 + 1e-6  # whitened [0,1]-0.5
    # labels normalized to ~[-1, 1]
    assert np.abs(np.asarray(out["coord"])[:, :2]).max() < 3.0
    assert out["pose"].shape == (4, 4)
    norms = np.linalg.norm(np.asarray(out["pose"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)  # quats stay normalized


def test_pipeline_label_image_consistency(rng):
    # Place a blob at the coord position; after augmentation the blob must sit
    # at the normalized coord location.
    B, SRC = 8, 96
    cx, cy = 45.0, 41.0
    from tests.test_warp_consistency import render_blob, soft_argmax

    img = render_blob(SRC, cx, cy, sigma=2.0).astype(np.uint8)
    images = jnp.asarray(np.tile(img[None], (B, 1, 1, 1)))
    labels = {
        "roi": jnp.asarray(np.tile([25.0, 21.0, 65.0, 61.0], (B, 1)).astype(np.float32)),
        # coord in the reference's raw convention: pixel centers at i (gets +0.5)
        "coord": jnp.asarray(np.tile([cx - 0.5, cy - 0.5, 10.0], (B, 1)).astype(np.float32)),
    }
    categories = {"roi": FieldCategory.roi, "coord": FieldCategory.xys}
    cfg = TrainAugmentationConfig(inputsize=65, enable_image_aug=False, p_flip_rot90=0.5)
    x, out = augment_batch_for_training(jax.random.PRNGKey(7), images, labels, categories, cfg)
    for i in range(B):
        blob = soft_argmax(np.asarray(x[i]) + 0.5)
        # unnormalize coord: [-1,1] -> [0,65]
        c = np.asarray(out["coord"][i, :2])
        expected = (c + 1.0) * 0.5 * 65.0
        assert np.linalg.norm(blob - expected) < 0.5, f"{blob} vs {expected}"


def test_pipeline_video_param_sharing(rng):
    images, labels, categories = _make_batch(rng, B=6)
    # Same source image everywhere so shared params => identical crops.
    images = jnp.tile(images[:1], (6, 1, 1, 1))
    cfg = TrainAugmentationConfig(inputsize=65, enable_image_aug=False)
    # Two sequences: [0..2], [3..5] -> param index maps to sequence starts
    param_index = jnp.asarray([0, 0, 0, 3, 3, 3])
    x, out = augment_batch_for_training(
        jax.random.PRNGKey(1), images, labels, categories, cfg, param_index=param_index
    )
    # Same source images + same params => identical outputs within a sequence
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(x[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x[3]), np.asarray(x[4]), atol=1e-6)


def test_crop_for_eval_backtransform(rng):
    images, labels, categories = _make_batch(rng)
    x, bt = crop_for_eval(images, labels["roi"], 129, expansion_factor=1.2)
    assert x.shape == (4, 129, 129, 1)
    assert bt.shape == (4, 2, 3)
    # backtransform maps crop coords back into the source roi neighborhood
    center = jnp.asarray([[129.0 / 2, 129.0 / 2]])
    src = np.asarray(affinevecmul(bt, jnp.tile(center, (4, 1))))
    np.testing.assert_allclose(src, np.tile([[45.0, 45.0]], (4, 1)), atol=1.0)


def test_equalize_flat_image():
    # A ramp image equalizes to (approximately) itself; a low-contrast image spreads out.
    ramp = jnp.linspace(0, 1, 64 * 64).reshape(1, 64, 64, 1)
    eq = np.asarray(intensity.equalize(ramp))
    assert abs(np.std(eq) - np.std(np.asarray(ramp))) < 0.05
    squeezed = ramp * 0.2 + 0.4
    eq2 = np.asarray(intensity.equalize(squeezed))
    assert np.std(eq2) > np.std(np.asarray(squeezed)) * 2


def test_posterize():
    x = jnp.asarray(np.linspace(0, 1, 256, dtype=np.float32).reshape(1, 16, 16, 1))
    out = np.asarray(intensity.posterize(x, jnp.asarray([4])))
    assert len(np.unique(out)) <= 16


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32))
    out = np.asarray(intensity.gaussian_blur(x))
    assert out.shape == x.shape
    np.testing.assert_allclose(out.mean(), np.asarray(x).mean(), atol=0.01)
    assert out.std() < np.asarray(x).std()


def test_noise_stage_clips():
    x = jnp.ones((4, 16, 16, 1)) * 0.99
    out = np.asarray(intensity.intensity_augmentation_noise(jax.random.PRNGKey(0), x))
    assert out.max() <= 1.0 and out.min() >= 0.0


def test_intensity_marginal_rates():
    # kornia random_apply=4: per batch a fixed 4-subset of ops applies, each
    # with per-sample probability. P(sample changed | subset) ranges over
    # subsets from 1-(.8*.8*.9*.99) ~ 0.43 to 1-.8^4 ~ 0.59.
    key = jax.random.PRNGKey(5)
    x = jnp.asarray(np.random.RandomState(0).rand(256, 24, 24, 1).astype(np.float32))
    out = intensity.intensity_augmentation_stage1(key, x)
    changed = np.mean(np.any(np.abs(np.asarray(out - x)) > 1e-6, axis=(1, 2, 3)))
    assert 0.25 < changed < 0.75

    # Across many batches the op SUBSET must vary (batch-level randomness).
    rates = []
    for i in range(8):
        o = intensity.intensity_augmentation_stage1(jax.random.PRNGKey(i), x)
        rates.append(np.mean(np.any(np.abs(np.asarray(o - x)) > 1e-6, axis=(1, 2, 3))))
    assert np.std(rates) > 0.005, rates
