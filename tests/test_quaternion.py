"""Quaternion ops validated against scipy ground truth.

Mirrors the reference test strategy (`test/test_torchquaternion.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from neuralnet_tracker_traincode_tpu.ops import quaternion as Q


def random_rotations(rng, n):
    return Rotation.random(n, random_state=rng)


def test_mult_matches_scipy(rng):
    a = random_rotations(rng, 32)
    b = random_rotations(rng, 32)
    expected = (a * b).as_quat()
    got = np.asarray(Q.mult(jnp.asarray(a.as_quat()), jnp.asarray(b.as_quat())))
    # Quaternions are sign-ambiguous
    sign = np.sign(np.sum(expected * got, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, expected, atol=1e-6)


def test_rotate_matches_scipy(rng):
    rots = random_rotations(rng, 16)
    pts = rng.randn(16, 3).astype(np.float32)
    expected = rots.apply(pts)
    got = np.asarray(Q.rotate(jnp.asarray(rots.as_quat(), jnp.float32), jnp.asarray(pts)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rotate_broadcast(rng):
    rots = random_rotations(rng, 4)
    pts = rng.randn(4, 7, 3).astype(np.float32)
    got = np.asarray(Q.rotate(jnp.asarray(rots.as_quat(), jnp.float32)[:, None, :], jnp.asarray(pts)))
    expected = np.stack([rots[i].apply(pts[i]) for i in range(4)])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_tomatrix_matches_scipy(rng):
    rots = random_rotations(rng, 32)
    got = np.asarray(Q.tomatrix(jnp.asarray(rots.as_quat())))
    np.testing.assert_allclose(got, rots.as_matrix(), atol=1e-6)


def test_from_matrix_matches_scipy(rng):
    rots = random_rotations(rng, 256)
    got = np.asarray(Q.from_matrix(jnp.asarray(rots.as_matrix())))
    expected = rots.as_quat()
    sign = np.sign(np.sum(expected * got, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, expected * sign, atol=1e-5)


def test_from_matrix_axis_aligned():
    # Exercise all 4 candidate branches incl. near-degenerate 180 degree rotations.
    rots = []
    for axis in ["x", "y", "z"]:
        for angle in [0.0, np.pi / 2, np.pi - 1e-7, np.pi]:
            rots.append(Rotation.from_euler(axis, angle))
    mats = np.stack([r.as_matrix() for r in rots])
    got = np.asarray(Q.from_matrix(jnp.asarray(mats)))
    expected = np.stack([r.as_quat() for r in rots])
    sign = np.where(np.sum(expected * got, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    np.testing.assert_allclose(got, expected * sign, atol=1e-5)


def test_from_matrix_batched_shapes(rng):
    rots = random_rotations(rng, 12)
    mats = jnp.asarray(rots.as_matrix()).reshape(3, 4, 3, 3)
    out = Q.from_matrix(mats)
    assert out.shape == (3, 4, 4)


def test_from_matrix_grad(rng):
    rots = random_rotations(rng, 8)
    m = jnp.asarray(rots.as_matrix())

    def f(m):
        return jnp.sum(Q.from_matrix(m) ** 2)

    g = jax.grad(f)(m)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rotvec_roundtrip(rng):
    rots = random_rotations(rng, 64)
    rv = jnp.asarray(rots.as_rotvec())
    q = Q.from_rotvec(rv)
    expected = rots.as_quat()
    sign = np.sign(np.sum(expected * np.asarray(q), axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q), expected * sign, atol=1e-6)
    back = np.asarray(Q.to_rotvec(q))
    # to_rotvec constrains angle to [0, pi]; scipy rotvec magnitudes already are.
    np.testing.assert_allclose(back, rots.as_rotvec(), atol=1e-5)


def test_rotation_delta_and_geodesic(rng):
    a = random_rotations(rng, 32)
    b = random_rotations(rng, 32)
    got = np.asarray(
        Q.rotation_delta(jnp.asarray(a.as_quat()), jnp.asarray(b.as_quat()))
    )
    expected = (a.inv() * b).as_rotvec()
    np.testing.assert_allclose(got, expected, atol=1e-5)
    geo = np.asarray(
        Q.geodesicdistance(jnp.asarray(a.as_quat()), jnp.asarray(b.as_quat()))
    )
    np.testing.assert_allclose(geo, (a.inv() * b).magnitude(), atol=1e-5)


def test_slerp_endpoint(rng):
    a = random_rotations(rng, 8)
    b = random_rotations(rng, 8)
    qa, qb = jnp.asarray(a.as_quat()), jnp.asarray(b.as_quat())
    s0 = np.asarray(Q.slerp(qa, qb, 0.0))
    s1 = np.asarray(Q.slerp(qa, qb, 1.0))
    sign0 = np.sign(np.sum(s0 * a.as_quat(), axis=-1, keepdims=True))
    sign1 = np.sign(np.sum(s1 * b.as_quat(), axis=-1, keepdims=True))
    np.testing.assert_allclose(s0 * sign0, a.as_quat(), atol=1e-5)
    np.testing.assert_allclose(s1 * sign1, b.as_quat(), atol=1e-5)


def test_positivereal():
    q = jnp.asarray([[0.0, 0.0, 0.0, -1.0], [0.1, 0.2, 0.3, 0.5]])
    out = np.asarray(Q.positivereal(q))
    assert out[0, 3] == 1.0
    np.testing.assert_allclose(out[1], np.asarray(q[1]))


def test_normalized():
    q = jnp.asarray([[2.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(Q.normalized(q)), [[1.0, 0, 0, 0]], atol=1e-6)


def test_distance_zero_for_same(rng):
    a = random_rotations(rng, 8).as_quat()
    d = np.asarray(Q.distance(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)
    d2 = np.asarray(Q.distance(jnp.asarray(a), jnp.asarray(-a)))
    np.testing.assert_allclose(d2, 0.0, atol=1e-6)


def test_quat_average(rng):
    base = random_rotations(rng, 16)
    perturb = [Rotation.from_rotvec(rng.randn(16, 3) * 0.01) for _ in range(5)]
    ensemble = np.stack([(base * p).as_quat() for p in perturb])
    # Randomly flip signs; the average must be invariant.
    flip = rng.choice([-1.0, 1.0], size=(5, 16, 1))
    avg = Q.quat_average(ensemble * flip)
    err = (Rotation.from_quat(avg).inv() * base).magnitude()
    assert np.all(err < 0.05)


def test_jit_and_vmap(rng):
    rots = random_rotations(rng, 8)
    q = jnp.asarray(rots.as_quat(), jnp.float32)
    jit_mult = jax.jit(Q.mult)
    np.testing.assert_allclose(
        np.asarray(jit_mult(q, q)), np.asarray(Q.mult(q, q)), atol=1e-6
    )
    vm = jax.vmap(Q.tomatrix)(q)
    np.testing.assert_allclose(np.asarray(vm), rots.as_matrix(), atol=1e-6)
