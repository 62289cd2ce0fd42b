"""Quaternion ops, scipy convention (real component LAST: x, y, z, w).

Behavioral contract follows the reference implementation
(`trackertraincode/neuralnets/torchquaternion.py:40-256`): Hamilton products,
vector rotation, quat<->matrix conversions (with the best-conditioned-of-four
candidate selection in `from_matrix`), rotvec conversions, slerp, and the
distance functions used by the losses. All functions are pure jnp, jit- and
vmap-friendly, and written with static shapes only.
"""

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

# Component indices (scipy convention, real last).
iw = 3
ii = 0
ij = 1
ik = 2
iijk = slice(0, 3)


def mult(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product of two quaternion arrays, components in last dim (i,j,k,w)."""
    ux, uy, uz, uw = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    vx, vy, vz, vw = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            uw * vx + ux * vw + uy * vz - uz * vy,
            uw * vy - ux * vz + uy * vw + uz * vx,
            uw * vz + ux * vy - uy * vx + uz * vw,
            uw * vw - ux * vx - uy * vy - uz * vz,
        ],
        axis=-1,
    )


def conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def rotate(q: jax.Array, p: jax.Array) -> jax.Array:
    """Rotate 3-vectors `p` by quaternions `q` (broadcasting over leading dims).

    Computes q * (p, 0) * conj(q), identifying p with a purely imaginary
    quaternion, exactly like the reference (`torchquaternion.py:51-67`) — i.e.
    for unnormalized q the result carries a |q|^2 factor.
    """
    q, _ = jnp.broadcast_arrays(q, jnp.concatenate([p, p[..., :1]], axis=-1))
    pq = jnp.concatenate([p, jnp.zeros_like(p[..., :1])], axis=-1)
    return mult(mult(q, pq), conjugate(q))[..., :3]


def tomatrix(q: jax.Array) -> jax.Array:
    """Normalized quaternion -> rotation matrix (..., 3, 3)."""
    qi, qj, qk, qw = q[..., ii], q[..., ij], q[..., ik], q[..., iw]
    m00 = 1.0 - 2.0 * (qj * qj + qk * qk)
    m10 = 2.0 * (qi * qj + qk * qw)
    m20 = 2.0 * (qi * qk - qj * qw)
    m01 = 2.0 * (qi * qj - qk * qw)
    m11 = 1.0 - 2.0 * (qi * qi + qk * qk)
    m21 = 2.0 * (qj * qk + qi * qw)
    m02 = 2.0 * (qi * qk + qj * qw)
    m12 = 2.0 * (qj * qk - qi * qw)
    m22 = 1.0 - 2.0 * (qi * qi + qj * qj)
    rows = jnp.stack(
        [
            jnp.stack([m00, m01, m02], axis=-1),
            jnp.stack([m10, m11, m12], axis=-1),
            jnp.stack([m20, m21, m22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def from_matrix(m: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion, picking the best conditioned of 4 solutions.

    Mirrors the ONNX-safe gather-style formulation of the reference
    (`torchquaternion.py:94-168`): compute 4 candidate quaternions (each derived
    from one of qi/qj/qk/qw taken from the diagonal) and select by argmax of the
    corresponding sqrt arguments.
    """
    assert m.shape[-2:] == (3, 3)
    shape = m.shape[:-2]
    m = m.reshape((-1, 3, 3))

    # All element accesses are explicit static slices: constant-index gathers
    # hit a catastrophic slow path on the TPU backend.
    m00, m01, m02 = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    m10, m11, m12 = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    m20, m21, m22 = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]

    sqrt_args = jnp.stack(
        [
            -m00 - m11 + m22 + 1.0,  # 4 qk^2
            -m00 + m11 - m22 + 1.0,  # 4 qj^2
            m00 - m11 - m22 + 1.0,  # 4 qi^2
            m00 + m11 + m22 + 1.0,  # 4 qw^2
        ],
        axis=-1,
    )
    sqrt_args = jnp.clip(sqrt_args, 1.0e-6, None)  # (N, 4)
    qx_from_x = 0.5 * jnp.sqrt(sqrt_args)  # columns: qk, qj, qi, qw
    qk_from_k, qj_from_j, qi_from_i, qw_from_w = jnp.moveaxis(qx_from_x, -1, 0)

    def od(a, b, sign, denom):
        return 0.25 * (a + sign * b) / denom

    qw_from_k = od(m10, m01, -1.0, qk_from_k)
    qi_from_k = od(m20, m02, 1.0, qk_from_k)
    qj_from_k = od(m12, m21, 1.0, qk_from_k)
    qw_from_j = od(m02, m20, -1.0, qj_from_j)
    qi_from_j = od(m10, m01, 1.0, qj_from_j)
    qk_from_j = od(m12, m21, 1.0, qj_from_j)
    qw_from_i = od(m21, m12, -1.0, qi_from_i)
    qj_from_i = od(m10, m01, 1.0, qi_from_i)
    qk_from_i = od(m02, m20, 1.0, qi_from_i)
    qi_from_w = od(m21, m12, -1.0, qw_from_w)
    qj_from_w = od(m02, m20, -1.0, qw_from_w)
    qk_from_w = od(m10, m01, -1.0, qw_from_w)

    candidates = jnp.stack(
        [
            jnp.stack([qi_from_k, qj_from_k, qk_from_k, qw_from_k], axis=-1),
            jnp.stack([qi_from_j, qj_from_j, qk_from_j, qw_from_j], axis=-1),
            jnp.stack([qi_from_i, qj_from_i, qk_from_i, qw_from_i], axis=-1),
            jnp.stack([qi_from_w, qj_from_w, qk_from_w, qw_from_w], axis=-1),
        ],
        axis=1,
    )  # (N, 4, 4)

    pick = jax.lax.stop_gradient(jnp.argmax(sqrt_args, axis=-1))
    onehot = jax.nn.one_hot(pick, 4, dtype=m.dtype)  # (N, 4)
    quat = jnp.einsum("nc,ncq->nq", onehot, candidates, precision=jax.lax.Precision.HIGHEST)
    quat = positivereal(quat)
    return quat.reshape(shape + (4,))


def from_rotvec(r: jax.Array, eps: float = 1.0e-12) -> jax.Array:
    angle = jnp.linalg.norm(r, axis=-1, keepdims=True)
    axis = r / (angle + eps)
    half = 0.5 * angle
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def to_rotvec(q: jax.Array, eps: float = 1.0e-12) -> jax.Array:
    # Positive real part constrains angles to [0, pi].
    q = positivereal(q)
    w = q[..., iw]
    axis = q[..., iijk]
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)
    return axis * angle[..., None] / (norm + eps)


def rotation_delta(from_: jax.Array, to_: jax.Array) -> jax.Array:
    """Rotation vector taking `from_` to `to_` (tangent-space difference)."""
    return to_rotvec(mult(conjugate(from_), to_))


def slerp(p: jax.Array, q: jax.Array, t: Union[float, jax.Array], eps: float = 1.0e-12) -> jax.Array:
    rotvec = rotation_delta(p, q) * t
    return mult(p, from_rotvec(rotvec, eps))


def positivereal(q: jax.Array) -> jax.Array:
    return q * jnp.sign(q[..., iw])[..., None]


def normalized(q: jax.Array, eps: float = 1.0e-6) -> jax.Array:
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """1 - <a,b>^2, a cheap rotation distance (reference `torchquaternion.py:225-228`)."""
    return 1.0 - jnp.square(jnp.sum(a * b, axis=-1))


def geodesicdistance(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.linalg.norm(rotation_delta(a, b), axis=-1)


def quat_average(quats) -> np.ndarray:
    """Ensemble average of quaternions with pivot-axis sign alignment (host numpy).

    Mirrors the pseudo-labeling ensemble average of the reference
    (`torchquaternion.py:239-256`). Input shape (E, N, 4).
    """
    quats = np.array(quats, copy=True)
    E, N, D = quats.shape
    assert D == 4
    pivot_axes = np.argmax(np.sum(np.abs(quats), axis=0), axis=-1)
    mask = np.take_along_axis(quats, pivot_axes[None, :, None], axis=-1) < 0.0
    mask = mask[..., 0]
    quats[mask, :] *= -1
    quats = np.average(quats, axis=0)
    norms = np.linalg.norm(quats, axis=-1, keepdims=True)
    if not np.all(norms > 0.5):
        print("quat_average: rotation predictions differ wildly (or there is a bug)")
    quats /= norms
    return quats
