"""Affine2d and math helpers (mirrors `test/test_math.py`)."""

import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.ops import mathfn
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d, roi_normalizing_transform


def apply(tr: Affine2d, pts: np.ndarray) -> np.ndarray:
    return np.asarray(mathfn.affinevecmul(tr.tensor(), jnp.asarray(pts, jnp.float32)))


def test_identity():
    tr = Affine2d.identity()
    pts = np.asarray([[1.0, 2.0], [-3.0, 0.5]])
    np.testing.assert_allclose(apply(tr, pts), pts, atol=1e-6)


def test_trs_and_inverse(rng):
    t = rng.randn(8, 2).astype(np.float32)
    a = rng.uniform(-np.pi, np.pi, size=(8,)).astype(np.float32)
    s = rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32)
    tr = Affine2d.trs(jnp.asarray(t), jnp.asarray(a), jnp.asarray(s))
    tr_inv = Affine2d.trs_inv(jnp.asarray(t), jnp.asarray(a), jnp.asarray(s))
    combined = tr @ tr_inv
    eye = np.broadcast_to(np.eye(2, 3), (8, 2, 3))
    np.testing.assert_allclose(np.asarray(combined.tensor()), eye, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tr.inv().tensor()), np.asarray(tr_inv.tensor()), atol=1e-5
    )


def test_trs_rotation_direction():
    # 90 degree rotation maps +x to +y
    tr = Affine2d.trs(angles=jnp.asarray([np.pi / 2], jnp.float32))
    out = apply(tr[0], np.asarray([1.0, 0.0]))
    np.testing.assert_allclose(out, [0.0, 1.0], atol=1e-6)


def test_horizontal_flip():
    tr = Affine2d.horizontal_flip(jnp.asarray(3.0, jnp.float32))
    out = apply(tr, np.asarray([[1.0, 5.0]]))
    np.testing.assert_allclose(out, [[5.0, 5.0]], atol=1e-6)
    assert np.asarray(tr.det) < 0


def test_range_remap_2d():
    tr = Affine2d.range_remap_2d(
        jnp.asarray([0.0, 0.0]), jnp.asarray([10.0, 20.0]), jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 1.0])
    )
    out = apply(tr, np.asarray([[0.0, 0.0], [10.0, 20.0], [5.0, 10.0]]))
    np.testing.assert_allclose(out, [[-1, -1], [1, 1], [0, 0]], atol=1e-6)


def test_compose_matches_sequential(rng):
    a = Affine2d.trs(
        jnp.asarray(rng.randn(4, 2), jnp.float32),
        jnp.asarray(rng.randn(4), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 1.5, 4), jnp.float32),
    )
    b = Affine2d.trs(
        jnp.asarray(rng.randn(4, 2), jnp.float32),
        jnp.asarray(rng.randn(4), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 1.5, 4), jnp.float32),
    )
    pts = rng.randn(4, 2).astype(np.float32)
    seq = apply(a, apply(b, pts))
    comp = apply(a @ b, pts)
    np.testing.assert_allclose(comp, seq, atol=1e-5)


def test_scales_and_det(rng):
    s = rng.uniform(0.5, 2.0, size=(8,)).astype(np.float32)
    a = rng.uniform(-np.pi, np.pi, size=(8,)).astype(np.float32)
    tr = Affine2d.trs(angles=jnp.asarray(a), scales=jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(tr.scales), s, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr.det), s * s, atol=1e-4)


def test_tensor33():
    tr = Affine2d.trs(translations=jnp.asarray([[1.0, 2.0]], jnp.float32))
    m33 = np.asarray(tr.tensor33())
    assert m33.shape == (1, 3, 3)
    np.testing.assert_allclose(m33[0, 2], [0, 0, 1], atol=1e-6)


def test_roi_normalizing_transform():
    roi = jnp.asarray([[2.0, 4.0, 6.0, 8.0]], jnp.float32)
    tr = roi_normalizing_transform(roi)
    out = apply(tr[0], np.asarray([[2.0, 4.0], [6.0, 8.0], [4.0, 6.0]]))
    np.testing.assert_allclose(out, [[-1, -1], [1, 1], [0, 0]], atol=1e-6)


def test_smoothclip0_inverse(rng):
    x = jnp.asarray(rng.uniform(-3.0, 3.0, size=100), jnp.float32)
    y = mathfn.smoothclip0(x)
    assert np.all(np.asarray(y) > 0)
    np.testing.assert_allclose(np.asarray(mathfn.inv_smoothclip0(y)), np.asarray(x), atol=1e-3)


def test_sqrclip0_inverse(rng):
    beta = 0.1
    x = jnp.asarray(rng.uniform(0.0, 3.0, size=100), jnp.float32)
    y = mathfn.sqrclip0(x, beta)
    np.testing.assert_allclose(np.asarray(mathfn.inv_sqrclip0(y, beta)), np.asarray(x), atol=1e-5)


def test_sqrclip0_values():
    # Quadratic region and linear region behavior
    beta = 1.0
    np.testing.assert_allclose(float(mathfn.sqrclip0(jnp.asarray(-0.5), beta)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(mathfn.sqrclip0(jnp.asarray(2.0), beta)), 2.0, atol=1e-6)
