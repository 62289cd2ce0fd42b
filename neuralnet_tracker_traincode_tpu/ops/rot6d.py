"""6D rotation representation (Zhou et al., continuity representation).

Contract follows the reference (`trackertraincode/neuralnets/torch6drotation.py`):
6 features -> two 3-vectors -> orthonormal frame via cross products, row-wise
normalization with eps 1e-6, and a fallback to identity when the result is far
from orthonormal (inf-norm of M M^T - I > 1e-3).
"""

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.ops.mathfn import matmul_hp


def _normalize_rows(m: jax.Array, eps: float = 1.0e-6) -> jax.Array:
    norm = jnp.linalg.norm(m, axis=-1, keepdims=True)
    return m / jnp.maximum(norm, eps)


def tomatrix(sixdrot: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) rotation matrix with rows [x, y, z]."""
    assert sixdrot.shape[-1] == 6
    prefix = sixdrot.shape[:-1]
    v = sixdrot.reshape((-1, 2, 3))
    x, y = v[:, 0, :], v[:, 1, :]
    z = jnp.cross(x, y)
    y = jnp.cross(z, x)
    out = jnp.stack([x, y, z], axis=-2)
    out = _normalize_rows(out)
    eye = jnp.eye(3, dtype=sixdrot.dtype)
    badness = jnp.max(
        jnp.abs((matmul_hp(out, jnp.swapaxes(out, -2, -1)) - eye).reshape(out.shape[:-2] + (9,))),
        axis=-1,
    )
    out = jnp.where(badness[:, None, None] > 1.0e-3, eye, out)
    return out.reshape(prefix + (3, 3))


def frommatrix(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): the first two rows, flattened."""
    assert m.shape[-2:] == (3, 3)
    return m[..., :-1, :].reshape(m.shape[:-2] + (6,))


def orthonormality_loss(m: jax.Array) -> jax.Array:
    assert m.shape[-1] == 6
    v = m.reshape(m.shape[:-1] + (2, 3))
    mm = matmul_hp(v, jnp.swapaxes(v, -2, -1))
    eye = jnp.eye(2, dtype=m.dtype)
    return jnp.mean(jnp.square(mm - eye).reshape(m.shape[:-1] + (4,)), axis=-1)


def rotation_distance_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """Shifted & scaled cosine of the geodesic distance: 0.75 - 0.25 tr(A B^T)."""
    assert a.shape[-2:] == (3, 3) and b.shape[-2:] == (3, 3)
    trace = jnp.trace(matmul_hp(a, jnp.swapaxes(b, -2, -1)), axis1=-2, axis2=-1)
    return 0.75 - 0.25 * trace
