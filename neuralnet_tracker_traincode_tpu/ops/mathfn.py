"""Small math helpers shared across the framework.

Contract: `trackertraincode/neuralnets/math.py` (smoothclip0 = elu + 1, the
squared-hinge sqrclip0 and their inverses, affine matrix-vector products).
"""

import functools

import jax
import jax.numpy as jnp


def matmul_hp(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-precision matmul for small geometry matrices.

    TPU matmuls default to bf16 accumulation; the affine/quaternion geometry
    math must stay in f32 regardless of the global precision policy.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def matvecmul(m: jax.Array, v: jax.Array) -> jax.Array:
    """matmul where v has no trailing column dimension."""
    return matmul_hp(m, v[..., None])[..., 0]


def affinevecmul(m: jax.Array, v: jax.Array) -> jax.Array:
    """Apply an affine (..., D, D+1) matrix to (..., D) vectors."""
    return matvecmul(m[..., :, :-1], v) + m[..., :, -1]


def smoothclip0(x: jax.Array) -> jax.Array:
    """Smooth ramp onto positive values: elu(x) + 1."""
    return jax.nn.elu(x) + 1.0


def inv_smoothclip0(x) -> jax.Array:
    x = jnp.asarray(x)
    safe_log = jnp.log(jnp.where(x > 1.0, 1.0, x))
    return jnp.where(x > 1.0, x - 1.0, safe_log)


def sqrclip0(x: jax.Array, beta: float) -> jax.Array:
    """Smoothed relu: quadratic in [-beta/2, beta/2], linear above."""
    z = jax.nn.relu(x + beta * 0.5)
    return jnp.where(z < beta, (0.5 / beta) * jnp.square(z), z - 0.5 * beta)


def inv_sqrclip0(y: jax.Array, beta: float) -> jax.Array:
    safe_sqrt = jnp.sqrt(jnp.maximum(beta * 2.0 * y, 0.0))
    return jnp.where(y > 0.5 * beta, y + 0.5 * beta, safe_sqrt) - beta * 0.5


def chain_gmm(*matrices) -> jax.Array:
    return functools.reduce(jnp.matmul, matrices)
