"""Pins the gather-free TPU warp (`warp_fast.warp_roi_rotate`) against the
reference-faithful bilinear gather warp (`warp.warp_affine`).

The fast path realizes the SAME geometric map (crop + center rotation +
flip/rot90) with a different — equally valid — resampling filter (separable
triangle + 3-pass Paeth shears vs 2x-oversampled bilinear). Tests assert:

* exact pixel equality where the filters coincide (integer unit-scale crop,
  theta=0),
* sub-0.1px effective geometric agreement under rotation (via centroid of a
  warped delta spot, which is filter-invariant),
* pixelwise closeness vs the gather warp on smooth content,
* flip/rot90 permutations exactly matching the Affine2d composition.

Reference behavior being replaced: the reference's train-time crop is cv2
`warpAffine`/area resampling on the host
(`/root/reference/trackertraincode/datatransformation/image_geometric_cv2.py`);
neither implementation here copies it — both are device-side redesigns.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.augmentation.geometric import (
    RoiFocusRandomizationParameters,
    flip_rot90_transform,
    focus_roi_components,
)
from neuralnet_tracker_traincode_tpu.augmentation.warp import warp_affine
from neuralnet_tracker_traincode_tpu.augmentation.warp_fast import (
    apply_fliprot,
    canvas_size,
    warp_roi_rotate,
)


def _params(B, angles=None, scales=None, translations=None):
    z = jnp.zeros((B,), jnp.float32)
    return RoiFocusRandomizationParameters(
        angles=z if angles is None else jnp.asarray(angles, jnp.float32),
        scales=jnp.ones((B,), jnp.float32) if scales is None else jnp.asarray(scales, jnp.float32),
        translations=jnp.zeros((B, 2), jnp.float32)
        if translations is None
        else jnp.asarray(translations, jnp.float32),
    )


def _smooth_images(rng, B, H, W, C=1):
    """Band-limited random images (so filter-choice differences stay small)."""
    small = rng.uniform(0.0, 255.0, size=(B, H // 8, W // 8, C)).astype(np.float32)
    x = jnp.asarray(small)
    x = jax.image.resize(x, (B, H, W, C), method="cubic")
    return jnp.clip(x, 0.0, 255.0)


def test_identity_crop_is_exact():
    """Unit-scale integer-aligned crop with theta=0 reproduces source pixels."""
    rng = np.random.RandomState(0)
    S = 32
    img = jnp.asarray(rng.uniform(0, 255, size=(2, 64, 64, 1)).astype(np.float32))
    roi = jnp.asarray([[8.0, 4.0, 8.0 + S, 4.0 + S]] * 2)
    out = warp_roi_rotate(img, roi, jnp.zeros((2,)), S, 30.0, skip_rotation=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(img[:, 4 : 4 + S, 8 : 8 + S, :]), atol=1e-4
    )


def test_matches_gather_warp_no_rotation():
    rng = np.random.RandomState(1)
    B, S = 4, 65
    img = _smooth_images(rng, B, 128, 128)
    roi = jnp.asarray(
        [[10.0, 20.0, 90.0, 100.0], [0.0, 0.0, 128.0, 128.0], [30.5, 8.25, 95.5, 73.25], [5.0, 5.0, 37.0, 37.0]]
    )
    params = _params(B)
    view_roi, tr = focus_roi_components(roi, params, S, round_roi=False)
    ref = warp_affine(img, tr, S, oversample=2)
    fast = warp_roi_rotate(img, view_roi, params.angles, S, 30.0, skip_rotation=True)
    err = np.abs(np.asarray(ref) - np.asarray(fast))
    assert err.mean() < 1.5 and np.percentile(err, 99) < 8.0, (err.mean(), np.percentile(err, 99))


def test_matches_gather_warp_rotated():
    rng = np.random.RandomState(2)
    B, S = 4, 65
    theta_max = 30.0
    img = _smooth_images(rng, B, 128, 128)
    roi = jnp.asarray([[16.0, 16.0, 112.0, 112.0]] * B)
    angles = jnp.asarray([0.0, 0.2, -0.35, math.radians(theta_max) * 0.99], jnp.float32)
    params = _params(B, angles=angles)
    view_roi, tr = focus_roi_components(roi, params, S, round_roi=False)
    ref = warp_affine(img, tr, S, oversample=2)
    fast = warp_roi_rotate(img, view_roi, angles, S, theta_max)
    r = np.asarray(ref).reshape(B, -1)
    f = np.asarray(fast).reshape(B, -1)
    for b in range(B):
        corr = np.corrcoef(r[b], f[b])[0, 1]
        assert corr > 0.995, (b, corr)
    assert np.abs(r - f).mean() < 4.0


def test_rotation_geometry_subpixel():
    """A delta spot lands within 0.15 px of where the exact transform sends it."""
    B, S = 3, 97
    H = W = 160
    angles = jnp.asarray([0.15, -0.3, 0.45], jnp.float32)
    img = jnp.zeros((B, H, W, 1), jnp.float32)
    # spot off-center at (x=100.5, y=60.5) source pixel centers
    img = img.at[:, 60, 100, 0].set(1000.0)
    roi = jnp.asarray([[20.0, 10.0, 140.0, 130.0]] * B)
    params = _params(B, angles=angles)
    view_roi, tr = focus_roi_components(roi, params, S, round_roi=False)
    fast = np.asarray(warp_roi_rotate(img, view_roi, angles, S, 30.0))[..., 0]
    # expected output position of the spot center under the exact label map
    from neuralnet_tracker_traincode_tpu.augmentation.affine import transform_points

    pt = jnp.asarray([[[100.5, 60.5]]] * B)
    expected = np.asarray(transform_points(tr, pt))[:, 0, :]
    yy, xx = np.mgrid[0:S, 0:S]
    for b in range(B):
        m = fast[b]
        tot = m.sum()
        assert tot > 1.0
        cx = (m * (xx + 0.5)).sum() / tot
        cy = (m * (yy + 0.5)).sum() / tot
        assert abs(cx - expected[b, 0]) < 0.15, (b, cx, expected[b])
        assert abs(cy - expected[b, 1]) < 0.15, (b, cy, expected[b])


def test_fliprot_matches_affine_composition():
    """apply_fliprot == warp with the composed flip/rot90 Affine2d, exactly."""
    rng = np.random.RandomState(3)
    B, S = 6, 33
    crop = jnp.asarray(rng.uniform(0, 255, size=(B, S, S, 2)).astype(np.float32))
    do_flip = jnp.asarray([0, 1, 0, 1, 0, 1], bool)
    rot_dir = jnp.asarray([0, 0, 1, 1, -1, -1], jnp.float32)
    fast = apply_fliprot(crop, do_flip, rot_dir)
    tr = flip_rot90_transform(do_flip, rot_dir, S)
    ref = warp_affine(crop, tr, S, oversample=1)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-3)


def test_constant_image_stays_constant():
    """Antialiased minification of a constant image is constant (weights sum to 1)."""
    B, S = 2, 49
    img = jnp.full((B, 200, 200, 1), 77.0, jnp.float32)
    roi = jnp.asarray([[10.0, 10.0, 190.0, 190.0]] * B)  # 3.7x minification
    out = warp_roi_rotate(img, roi, jnp.asarray([0.1, -0.2]), S, 30.0)
    inner = np.asarray(out)[:, 2:-2, 2:-2, :]
    np.testing.assert_allclose(inner, 77.0, atol=0.1)


def test_canvas_size_covers_pull_chain():
    for theta in (5.0, 15.0, 30.0, 40.0):
        for S in (65, 129):
            C = canvas_size(S, theta)
            assert C >= S and (C - S) % 2 == 0
            # rotated-square bound: the S-crop rotated by theta fits in the canvas
            need = S * (abs(math.cos(math.radians(theta))) + abs(math.sin(math.radians(theta))))
            assert C + 2 >= need


def test_multichannel_consistency():
    """Each channel is warped identically (channel loop correctness)."""
    rng = np.random.RandomState(4)
    B, S = 2, 33
    base = rng.uniform(0, 255, size=(B, 96, 96, 1)).astype(np.float32)
    img3 = jnp.asarray(np.concatenate([base, base * 0.5, base + 1.0], axis=-1))
    roi = jnp.asarray([[8.0, 8.0, 88.0, 88.0]] * B)
    out = np.asarray(warp_roi_rotate(img3, roi, jnp.asarray([0.2, -0.1]), S, 30.0))
    np.testing.assert_allclose(out[..., 1], out[..., 0] * 0.5, atol=1e-3)
    # +1 offset passes through affinely only where the filter support is
    # fully in-range; check the interior
    np.testing.assert_allclose(
        out[:, 4:-4, 4:-4, 2], out[:, 4:-4, 4:-4, 0] + 1.0, atol=2e-2
    )
