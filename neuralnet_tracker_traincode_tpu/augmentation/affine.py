"""Category-dispatched application of 2D affine transforms to labels.

Contract: `trackertraincode/datatransformation/tensors/affinetrafo.py`:
 - points: xy affine; z scaled by sqrt|det|; landmark flip reindex on reflection
 - roi: transform 4 corners, take AABB
 - coord: xy affine + size * isotropic scale
 - quat: premultiply the in-plane z-rotation extracted from the matrix's
   y-column; mirror-conjugate imaginary parts on reflection.

Everything is branch-free (jnp.where) so it works under jit with batches.
"""

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory, imagelike_categories
from neuralnet_tracker_traincode_tpu.facemodel.keypoints68 import flip_map
from neuralnet_tracker_traincode_tpu.ops import quaternion as Q
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d
from neuralnet_tracker_traincode_tpu.ops.mathfn import affinevecmul

_flip_map = tuple(flip_map)


def position_normalization(w: int, h: int) -> Affine2d:
    return Affine2d.range_remap_2d([0.0, 0.0], [float(w), float(h)], [-1.0, -1.0], [1.0, 1.0])


def position_unnormalization(w: int, h: int) -> Affine2d:
    return Affine2d.range_remap_2d([-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [float(w), float(h)])


def transform_points(tr: Affine2d, points: jax.Array) -> jax.Array:
    assert points.shape[-1] in (2, 3), f"Bad point array shape: {points.shape}"
    m = tr.tensor()
    batch_dimensions = m.shape[:-2]
    assert points.shape[: len(batch_dimensions)] == batch_dimensions
    new_shape = (
        batch_dimensions
        + tuple(1 for _ in range(len(points.shape) - len(batch_dimensions) - 1))
        + (2, 3)
    )
    m = m.reshape(new_shape)
    if points.shape[-1] == 2:
        return affinevecmul(m, points)
    xy = affinevecmul(m, points[..., :2])
    # Scale z like x and y; never invert z on reflections.
    extra = len(points.shape) - len(batch_dimensions) - 1
    detscale = jnp.sqrt(jnp.abs(tr.det)).reshape(batch_dimensions + (1,) * extra + (1,))
    z = detscale * points[..., 2:]
    z = jnp.broadcast_to(z, xy.shape[:-1] + (1,))
    return jnp.concatenate([xy, z], axis=-1)


import numpy as _np

# Permutation as a matrix: gathers with compile-time-constant indices hit a
# catastrophic slow path on the TPU backend (~25 ms fixed cost per gather);
# the 68x68 constant matmul is effectively free.
_flip_perm = _np.zeros((68, 68), _np.float32)
_flip_perm[_np.arange(68), _np.asarray(_flip_map)] = 1.0


def transform_keypoints(tr: Affine2d, points: jax.Array) -> jax.Array:
    """Like transform_points but reindexes the 68 landmarks under reflection."""
    out = transform_points(tr, points)
    flipped = jnp.einsum(
        "pq,...qd->...pd",
        jnp.asarray(_flip_perm, out.dtype),
        out,
        precision=jax.lax.Precision.HIGHEST,
    )
    det = tr.det
    mask = (det < 0.0).reshape(det.shape + (1, 1))
    return jnp.where(mask, flipped, out)


def transform_roi(tr: Affine2d, roi: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = jnp.moveaxis(roi, -1, 0)
    corners = jnp.stack(
        [
            jnp.stack([x0, y0], axis=-1),
            jnp.stack([x0, y1], axis=-1),
            jnp.stack([x1, y0], axis=-1),
            jnp.stack([x1, y1], axis=-1),
        ],
        axis=-2,
    )
    pts = transform_points(tr, corners[..., :2])
    lo = jnp.amin(pts, axis=-2)
    hi = jnp.amax(pts, axis=-2)
    return jnp.concatenate([lo, hi], axis=-1)


def transform_coord(tr: Affine2d, coord: jax.Array) -> jax.Array:
    xy = affinevecmul(tr.tensor(), coord[..., :2])
    size = tr.scales * coord[..., 2]
    return jnp.concatenate([xy, size[..., None]], axis=-1)


def transform_rot(tr: Affine2d, quat: jax.Array) -> jax.Array:
    m = tr.tensor()
    # Use the "y"-vector to recover the in-plane angle so a pure horizontal
    # flip yields zero rotation.
    sn = -m[..., 0, 1]
    cs = m[..., 1, 1]
    detsign = jnp.sign(tr.det)
    alpha = jnp.arctan2(sn, cs)
    qw = jnp.cos(alpha * 0.5)
    qk = jnp.sin(alpha * 0.5) * detsign
    zeros = jnp.zeros_like(qw)
    zrot = jnp.stack([zeros, zeros, qk, qw], axis=-1)
    zrot = jnp.broadcast_to(zrot, quat.shape)
    out = Q.mult(zrot, quat)
    # Reflection of one axis negates the imaginary components of the
    # non-reflected axes (R' = T R T^-1).
    detsign_b = jnp.broadcast_to(detsign[..., None], out[..., 1:3].shape)
    out = jnp.concatenate(
        [out[..., :1], detsign_b * out[..., 1:3], out[..., 3:]], axis=-1
    )
    return out


_transform_table = {
    FieldCategory.xys: transform_coord,
    FieldCategory.quat: transform_rot,
    FieldCategory.roi: transform_roi,
    FieldCategory.points: transform_keypoints,
}


def apply_affine2d(trafo: Affine2d, key: str, value: jax.Array, category: FieldCategory):
    assert category not in imagelike_categories
    if key == "image_backtransform":
        # BT' = BT @ trafo^-1: maps post-transform points back to the original image.
        return (Affine2d(value) @ trafo.inv()).tensor()
    fn = _transform_table.get(category)
    if fn is None:
        return value
    return fn(trafo, value)
