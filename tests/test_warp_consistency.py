"""Image-warp <-> point-transform consistency (mirrors `test_affine_img_trafo.py:96-256`).

Render a gaussian blob at a known point, warp the image with the device kernel,
recover the blob position via soft-argmax, and require it to match the
affine-transformed point within a fraction of a pixel. This is the correctness
gate for the fused augmentation warp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.augmentation import geometric
from neuralnet_tracker_traincode_tpu.augmentation.affine import transform_points
from neuralnet_tracker_traincode_tpu.augmentation.warp import croprescale, warp_affine
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d


def render_blob(size, cx, cy, sigma=3.0):
    """Gaussian blob centered at continuous coords (cx, cy), pixel centers i+0.5."""
    x = np.arange(size) + 0.5
    g = np.exp(-0.5 * ((x[None, :] - cx) ** 2 + (x[:, None] - cy) ** 2) / sigma**2)
    return (g * 255.0).astype(np.float32)[..., None]


def soft_argmax(img):
    """Recover blob position in continuous coords (pixel centers i+0.5)."""
    img = np.asarray(img)[..., 0].astype(np.float64)
    img = img - img.min()
    H, W = img.shape
    x = np.arange(W) + 0.5
    y = np.arange(H) + 0.5
    total = img.sum()
    cx = (img.sum(axis=0) * x).sum() / total
    cy = (img.sum(axis=1) * y).sum() / total
    return np.array([cx, cy])


@pytest.mark.parametrize("angle", [0.0, 0.4, -np.pi / 2])
@pytest.mark.parametrize("scale", [0.5, 1.0, 2.3])
def test_warp_blob_consistency(angle, scale):
    SRC, DST = 128, 64
    pt = np.array([70.0, 50.0])
    img = render_blob(SRC, *pt)

    center_dst = DST / 2.0
    tr = (
        Affine2d.trs(translations=jnp.asarray([[center_dst, center_dst]], jnp.float32))
        @ Affine2d.trs(
            angles=jnp.asarray([angle], jnp.float32), scales=jnp.asarray([scale], jnp.float32)
        )
        @ Affine2d.trs(translations=jnp.asarray([[-pt[0] + 3.0, -pt[1] - 2.0]], jnp.float32))
    )
    warped = warp_affine(jnp.asarray(img[None]), tr, DST, oversample=2)
    expected_pt = np.asarray(transform_points(tr, jnp.asarray(pt[None], jnp.float32)))[0]
    recovered = soft_argmax(warped[0])
    err = np.linalg.norm(recovered - expected_pt)
    assert err < 0.35, f"blob err {err} px; expected {expected_pt}, got {recovered}"


def test_croprescale_matches_warp():
    SRC = 100
    img = render_blob(SRC, 40.0, 60.0)
    roi = jnp.asarray([[20.0, 30.0, 84.0, 94.0]], jnp.float32)
    out = croprescale(jnp.asarray(img[None]), roi, 32, oversample=2)
    tr = Affine2d.range_remap_2d(roi[..., :2], roi[..., 2:], jnp.zeros((1, 2)), jnp.full((1, 2), 32.0))
    out2 = warp_affine(jnp.asarray(img[None]), tr, 32, oversample=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_warp_zero_padding():
    img = jnp.full((1, 32, 32, 1), 255.0)
    # Crop mostly outside the image
    tr = Affine2d.range_remap_2d(
        jnp.asarray([[-64.0, -64.0]]), jnp.asarray([[0.0, 0.0]]),
        jnp.zeros((1, 2)), jnp.full((1, 2), 16.0),
    )
    out = np.asarray(warp_affine(img, tr, 16))
    assert out.max() <= 1.0  # only border bleeding, everything else zero
    assert out.min() == 0.0


def test_focus_roi_view_roi_cases():
    # Hand-computed boxes like the reference's parameterized test
    # (`test_affine_img_trafo.py:49-69`): bbox 10..20, enlargement 2 => size 20.
    bbox = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    ef = jnp.asarray([2.0])
    # No translation: centered box of size 20
    roi = np.asarray(
        geometric.compute_view_roi(bbox, ef, jnp.zeros((1, 2)), beyond_border_shift=0.3)
    )
    np.testing.assert_allclose(roi[0], [5.0, 5.0, 25.0, 25.0], atol=1e-5)
    # Full positive translation: wiggle = 0.5*|20-10| + 0.3*10 = 8
    roi = np.asarray(
        geometric.compute_view_roi(bbox, ef, jnp.ones((1, 2)), beyond_border_shift=0.3)
    )
    np.testing.assert_allclose(roi[0], [13.0, 13.0, 33.0, 33.0], atol=1e-5)


def test_roi_randomization_distribution():
    key = jax.random.PRNGKey(0)
    params = geometric.make_roi_randomization_parameters(key, (4096,), 30.0, 1.1)
    scales = np.asarray(params.scales)
    assert np.all(scales >= 0.6) and np.all(scales <= 1.6)
    assert abs(scales.mean() - 1.1) < 0.01
    angles = np.asarray(params.angles)
    frac_rotated = np.mean(angles != 0)
    assert abs(frac_rotated - 1.0 / 3.0) < 0.03
    assert np.allclose(np.abs(angles[angles != 0]), np.pi / 6, atol=1e-6)
    t = np.asarray(params.translations)
    assert np.all(np.abs(t) <= 1.0)


def test_flip_rot90_transform_statistics():
    key = jax.random.PRNGKey(1)
    tr = geometric.random_flip_rot90_transform(key, (2048,), 129, p_rot=0.2)
    det = np.asarray(tr.det)
    # Half the samples flipped (negative det)
    assert abs(np.mean(det < 0) - 0.5) < 0.05
    # Rotation fraction ~0.2 (off-diagonal structure)
    m = np.asarray(tr.tensor())
    rotated = np.abs(m[:, 0, 0]) < 1e-6  # 90 deg rotations have zero diagonal
    assert abs(np.mean(rotated) - 0.2) < 0.05


def test_flip_rot90_image_label_consistency():
    # The composed transform must keep blob and point aligned through the warp.
    SRC = 64
    pt = np.array([20.0, 28.0])
    img = render_blob(SRC, *pt)
    key = jax.random.PRNGKey(3)
    # crop transform: identity remap (whole image)
    B = 16
    imgs = jnp.tile(jnp.asarray(img[None]), (B, 1, 1, 1))
    tr_crop = Affine2d.range_remap_2d(
        jnp.zeros((B, 2)), jnp.full((B, 2), float(SRC)), jnp.zeros((B, 2)), jnp.full((B, 2), float(SRC))
    )
    tr_fr = geometric.random_flip_rot90_transform(key, (B,), SRC, p_rot=0.5)
    tr = tr_fr @ tr_crop
    warped = warp_affine(imgs, tr, SRC, oversample=1)
    pts = jnp.tile(jnp.asarray(pt[None, None], jnp.float32), (B, 1, 1))
    expected = np.asarray(transform_points(tr, pts))[:, 0]
    for i in range(B):
        rec = soft_argmax(warped[i])
        assert np.linalg.norm(rec - expected[i]) < 0.3, f"sample {i}"
