"""Scale (uncertainty) parameterizations for the NLL losses.

Contract: `trackertraincode/neuralnets/negloglikelihood.py:22-242`:
 - Neck: features -> (values, global positive multiplier)
 - FeaturesAsDiagonalScale / DiagonalScaleParameter / FeaturesAsTriangularScale
 - positivity via smoothclip0 (+1e-6 eps), triangular fill via ONNX-safe gather.

Module names carry the `uncertainty` prefix used by the optimizer's param
grouping (variance params train at 0.1x lr, `train_poseestimator.py:114-143`).
"""

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.ops.mathfn import inv_smoothclip0, smoothclip0

make_positive = smoothclip0
inv_make_positive = inv_smoothclip0


# inv_smoothclip0(1.0) == log(1.0) == 0.0, precomputed host-side (init fns are traced).
_INV_POSITIVE_ONE = float(np.log(1.0))


def _bias_init_ones_hidden(key, shape, dtype=jnp.float32):
    return jnp.full(shape, _INV_POSITIVE_ONE, dtype)


class Neck(nn.Module):
    """Linear producing per-feature values plus one global positive multiplier."""

    num_out_features: int
    bias_values_init: Callable | None = None  # init for the value part of the bias

    @nn.compact
    def __call__(self, x):
        def bias_init(key, shape, dtype=jnp.float32):
            b = _bias_init_ones_hidden(key, shape, dtype)
            if self.bias_values_init is not None:
                b = b.at[1:].set(self.bias_values_init(key, (shape[0] - 1,), dtype))
            return b

        x = nn.Dense(self.num_out_features + 1, bias_init=bias_init, name="lin")(x)
        return x[..., 1:], make_positive(x[..., :1])


class FeaturesAsDiagonalScale(nn.Module):
    num_out_features: int
    eps: float = 1.0e-6

    @nn.compact
    def __call__(self, x):
        x, multiplier = Neck(self.num_out_features, name="neck")(x)
        return make_positive(x) * multiplier + self.eps


class DiagonalScaleParameter(nn.Module):
    """Trainable input-independent positive scale, starting at 1."""

    num_out_features: int
    eps: float = 1.0e-6

    @nn.compact
    def __call__(self):
        hidden = self.param(
            "hidden_scale", _bias_init_ones_hidden, (self.num_out_features + 1,)
        )
        return make_positive(hidden[:1]) * make_positive(hidden[1:]) + self.eps


def fill_triangular_matrix(dim: int, z: jax.Array) -> jax.Array:
    """Fill a lower-triangular matrix: first `dim` values on the diagonal, then
    off-diagonals. Gather-style (ONNX-safe) for dim == 3, general otherwise.
    Contract: `negloglikelihood.py:187-222`.
    """
    if dim == 3:
        # Stack-based construction: a constant-index gather here costs ~25 ms
        # on the TPU backend; explicit slicing + stacking is free.
        zero = jnp.zeros_like(z[..., 0])
        row0 = jnp.stack([z[..., 0], zero, zero], axis=-1)
        row1 = jnp.stack([z[..., 3], z[..., 1], zero], axis=-1)
        row2 = jnp.stack([z[..., 4], z[..., 5], z[..., 2]], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)
    irow, icol = np.tril_indices(dim, -1)
    m = jnp.zeros(z.shape[:-1] + (dim, dim), z.dtype)
    m = m.at[..., irow, icol].set(z[..., dim:])
    i = np.arange(dim)
    return m.at[..., i, i].set(z[..., :dim])


class FeaturesAsTriangularScale(nn.Module):
    """Features -> lower-triangular scale (Cholesky factor) with positive diagonal."""

    dim: int

    @nn.compact
    def __call__(self, x):
        num_matrix_params = (self.dim * (self.dim + 1)) // 2

        def bias_values_init(key, shape, dtype=jnp.float32):
            b = jnp.full(shape, _INV_POSITIVE_ONE, dtype)
            return b.at[self.dim :].set(0.0)  # offdiagonals

        x, multiplier = Neck(num_matrix_params, bias_values_init=bias_values_init, name="neck")(x)
        min_diag = jnp.concatenate(
            [jnp.full((self.dim,), 1.0e-6), jnp.zeros((num_matrix_params - self.dim,))]
        )
        z = jnp.concatenate([make_positive(x[..., : self.dim]), x[..., self.dim :]], axis=-1)
        z = multiplier * z + min_diag
        return fill_triangular_matrix(self.dim, z)
