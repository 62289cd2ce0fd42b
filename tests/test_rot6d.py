"""6D rotation representation tests (mirrors `test/test_torch6drotation.py`)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from neuralnet_tracker_traincode_tpu.ops import rot6d


def test_roundtrip(rng):
    rots = Rotation.random(32, random_state=rng)
    m = rots.as_matrix()
    six = np.asarray(rot6d.frommatrix(jnp.asarray(m)))
    assert six.shape == (32, 6)
    back = np.asarray(rot6d.tomatrix(jnp.asarray(six)))
    np.testing.assert_allclose(back, m, atol=1e-5)


def test_tomatrix_normalizes(rng):
    rots = Rotation.random(8, random_state=rng)
    six = np.asarray(rot6d.frommatrix(jnp.asarray(rots.as_matrix())))
    scaled = six * 3.0  # scaling must not change the rotation
    back = np.asarray(rot6d.tomatrix(jnp.asarray(scaled)))
    np.testing.assert_allclose(back, rots.as_matrix(), atol=1e-5)


def test_degenerate_fallback():
    # x and y colinear -> badly conditioned -> identity fallback
    six = jnp.asarray([[1.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
    out = np.asarray(rot6d.tomatrix(six))
    np.testing.assert_allclose(out[0], np.eye(3), atol=1e-6)


def test_orthonormality_loss(rng):
    rots = Rotation.random(8, random_state=rng)
    six = rot6d.frommatrix(jnp.asarray(rots.as_matrix()))
    loss = np.asarray(rot6d.orthonormality_loss(six))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)
    loss2 = np.asarray(rot6d.orthonormality_loss(six * 2.0))
    assert np.all(loss2 > 0.1)


def test_rotation_distance_loss(rng):
    rots = Rotation.random(16, random_state=rng)
    m = jnp.asarray(rots.as_matrix())
    zero = np.asarray(rot6d.rotation_distance_loss(m, m))
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)
    other = Rotation.random(16, random_state=rng)
    d = np.asarray(rot6d.rotation_distance_loss(m, jnp.asarray(other.as_matrix())))
    angles = (rots.inv() * other).magnitude()
    expected = 0.75 - 0.25 * (1.0 + 2.0 * np.cos(angles))
    np.testing.assert_allclose(d, expected, atol=1e-5)
