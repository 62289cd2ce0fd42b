"""Label-side affine transform semantics (mirrors parts of `test_affine_img_trafo.py`)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from neuralnet_tracker_traincode_tpu.augmentation import affine as A
from neuralnet_tracker_traincode_tpu.facemodel.keypoints68 import flip_map
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d


def test_transform_points_2d(rng):
    tr = Affine2d.trs(
        translations=jnp.asarray([[1.0, 2.0]], jnp.float32),
        angles=jnp.asarray([0.5], jnp.float32),
        scales=jnp.asarray([2.0], jnp.float32),
    )
    pts = rng.randn(1, 10, 2).astype(np.float32)
    out = np.asarray(A.transform_points(tr, jnp.asarray(pts)))
    cs, sn = 2 * np.cos(0.5), 2 * np.sin(0.5)
    expected_x = cs * pts[..., 0] - sn * pts[..., 1] + 1.0
    expected_y = sn * pts[..., 0] + cs * pts[..., 1] + 2.0
    np.testing.assert_allclose(out[..., 0], expected_x, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], expected_y, atol=1e-5)


def test_transform_points_3d_z_scaling(rng):
    tr = Affine2d.trs(scales=jnp.asarray([3.0], jnp.float32))
    pts = rng.randn(1, 5, 3).astype(np.float32)
    out = np.asarray(A.transform_points(tr, jnp.asarray(pts)))
    np.testing.assert_allclose(out[..., 2], 3.0 * pts[..., 2], atol=1e-5)


def test_transform_keypoints_flip(rng):
    # A horizontal flip must reindex landmarks via flip_map.
    tr = Affine2d.horizontal_flip(jnp.asarray([0.0], jnp.float32))
    pts = rng.randn(1, 68, 3).astype(np.float32)
    out = np.asarray(A.transform_keypoints(tr, jnp.asarray(pts)))
    expected_x = -pts[..., 0]
    expected = np.stack([expected_x, pts[..., 1], pts[..., 2]], axis=-1)[:, flip_map, :]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_transform_roi_aabb():
    tr = Affine2d.trs(angles=jnp.asarray([np.pi / 2], jnp.float32))
    roi = jnp.asarray([[0.0, 0.0, 2.0, 1.0]], jnp.float32)
    out = np.asarray(A.transform_roi(tr, roi))
    # Rotating the box by 90 deg: x in [-1, 0], y in [0, 2]
    np.testing.assert_allclose(out[0], [-1.0, 0.0, 0.0, 2.0], atol=1e-5)


def test_transform_coord():
    tr = Affine2d.trs(
        translations=jnp.asarray([[1.0, 0.0]], jnp.float32), scales=jnp.asarray([2.0], jnp.float32)
    )
    coord = jnp.asarray([[1.0, 1.0, 0.5]], jnp.float32)
    out = np.asarray(A.transform_coord(tr, coord))
    np.testing.assert_allclose(out[0], [3.0, 2.0, 1.0], atol=1e-5)


def test_transform_rot_pure_rotation():
    angle = 0.3
    tr = Affine2d.trs(angles=jnp.asarray([angle], jnp.float32))
    base = Rotation.from_euler("XYZ", [0.2, -0.1, 0.4])
    out = np.asarray(A.transform_rot(tr, jnp.asarray(base.as_quat()[None], jnp.float32)))
    expected = (Rotation.from_euler("z", angle) * base).as_quat()
    sign = np.sign(np.sum(out * expected, axis=-1, keepdims=True))
    np.testing.assert_allclose(out * sign, expected[None], atol=1e-5)


def test_transform_rot_flip_is_identity_angle():
    # Horizontal flip: zero in-plane rotation, imaginary parts mirrored.
    tr = Affine2d.horizontal_flip(jnp.asarray([64.0], jnp.float32))
    base = Rotation.from_euler("XYZ", [0.2, -0.3, 0.4])
    q = base.as_quat()
    out = np.asarray(A.transform_rot(tr, jnp.asarray(q[None], jnp.float32)))[0]
    np.testing.assert_allclose(out, [q[0], -q[1], -q[2], q[3]], atol=1e-5)


def test_backtransform_chaining():
    tr1 = Affine2d.trs(translations=jnp.asarray([[2.0, 3.0]], jnp.float32))
    bt = tr1.inv().tensor()
    tr2 = Affine2d.trs(scales=jnp.asarray([2.0], jnp.float32))
    bt2 = A.apply_affine2d(tr2, "image_backtransform", bt, None)
    # Point p transformed by tr2 then mapped back via bt2 must equal tr1^-1(p).
    p = jnp.asarray([[5.0, 7.0]], jnp.float32)
    from neuralnet_tracker_traincode_tpu.ops.mathfn import affinevecmul

    q = affinevecmul(tr2.tensor(), p)
    back = affinevecmul(bt2, q)
    expected = affinevecmul(bt, p)
    np.testing.assert_allclose(np.asarray(back), np.asarray(expected), atol=1e-5)
