"""Batched 2D affine transforms stored as (..., 2, 3) arrays.

Contract: `trackertraincode/neuralnets/affine2d.py`. Registered as a pytree so
Affine2d values flow through jit/vmap/scan.
"""

import dataclasses
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.ops.mathfn import matvecmul, matmul_hp

SQRT2 = math.sqrt(2.0)

MaybeArray = Optional[jax.Array]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Affine2d:
    m: jax.Array  # (..., 2, 3)

    def __post_init__(self):
        assert self.m.shape[-2:] == (2, 3), f"Bad affine shape {self.m.shape}"

    def tree_flatten(self):
        return (self.m,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        (m,) = children
        return cls(m)

    # ---- constructors -----------------------------------------------------
    @staticmethod
    def identity() -> "Affine2d":
        return Affine2d(jnp.eye(2, 3, dtype=jnp.float32))

    @staticmethod
    def trs(
        translations: MaybeArray = None,
        angles: MaybeArray = None,
        scales: MaybeArray = None,
    ) -> "Affine2d":
        """Translation-rotation-scale transform (scale and rotation applied first)."""
        shape = Affine2d._batch_shape(translations, angles, scales)
        if angles is None:
            rot = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), shape + (2, 2))
            if scales is not None:
                rot = rot * jnp.asarray(scales, jnp.float32)[..., None, None]
        else:
            angles = jnp.asarray(angles, jnp.float32)
            cs, sn = jnp.cos(angles), jnp.sin(angles)
            if scales is not None:
                scales = jnp.asarray(scales, jnp.float32)
                cs, sn = cs * scales, sn * scales
            rot = jnp.stack(
                [jnp.stack([cs, -sn], axis=-1), jnp.stack([sn, cs], axis=-1)], axis=-2
            )
            rot = jnp.broadcast_to(rot, shape + (2, 2))
        if translations is not None:
            t = jnp.broadcast_to(jnp.asarray(translations, jnp.float32), shape + (2,))
        else:
            t = jnp.zeros(shape + (2,), jnp.float32)
        return Affine2d(jnp.concatenate([rot, t[..., None]], axis=-1))

    @staticmethod
    def trs_inv(
        translations: MaybeArray = None,
        angles: MaybeArray = None,
        scales: MaybeArray = None,
    ) -> "Affine2d":
        """Inverse of trs(translations, angles, scales)."""
        shape = Affine2d._batch_shape(translations, angles, scales)
        if angles is None:
            rot = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), shape + (2, 2))
            if scales is not None:
                rot = rot / jnp.asarray(scales, jnp.float32)[..., None, None]
        else:
            angles = jnp.asarray(angles, jnp.float32)
            cs, sn = jnp.cos(angles), jnp.sin(angles)
            if scales is not None:
                scales = jnp.asarray(scales, jnp.float32)
                cs, sn = cs / scales, sn / scales
            rot = jnp.stack(
                [jnp.stack([cs, sn], axis=-1), jnp.stack([-sn, cs], axis=-1)], axis=-2
            )
            rot = jnp.broadcast_to(rot, shape + (2, 2))
        if translations is not None:
            t = jnp.broadcast_to(jnp.asarray(translations, jnp.float32), shape + (2,))
            t = matvecmul(rot, -t)
        else:
            t = jnp.zeros(shape + (2,), jnp.float32)
        return Affine2d(jnp.concatenate([rot, t[..., None]], axis=-1))

    @staticmethod
    def horizontal_flip(xcenter: jax.Array) -> "Affine2d":
        xcenter = jnp.asarray(xcenter, jnp.float32)
        shape = xcenter.shape
        zeros = jnp.zeros(shape, jnp.float32)
        ones = jnp.ones(shape, jnp.float32)
        row0 = jnp.stack([-ones, zeros, 2.0 * xcenter], axis=-1)
        row1 = jnp.stack([zeros, ones, zeros], axis=-1)
        return Affine2d(jnp.stack([row0, row1], axis=-2))

    @staticmethod
    def range_remap(inmin, inmax, outmin, outmax) -> "Affine2d":
        """Isotropic remap of scalar ranges: X -> (X - inmin) * s + outmin."""
        inmin, inmax, outmin, outmax = (
            jnp.asarray(x, jnp.float32) for x in (inmin, inmax, outmin, outmax)
        )
        s = (outmax - outmin) / (inmax - inmin)
        shape = s.shape
        zeros = jnp.zeros(shape, jnp.float32)
        t = outmin - inmin * s
        row0 = jnp.stack([s, zeros, jnp.broadcast_to(t, shape)], axis=-1)
        row1 = jnp.stack([zeros, s, jnp.broadcast_to(t, shape)], axis=-1)
        return Affine2d(jnp.stack([row0, row1], axis=-2))

    @staticmethod
    def range_remap_2d(inmin, inmax, outmin, outmax) -> "Affine2d":
        """Per-axis remap; args have a trailing 2-dim (x, y)."""
        inmin, inmax, outmin, outmax = (
            jnp.asarray(x, jnp.float32) for x in (inmin, inmax, outmin, outmax)
        )
        s = (outmax - outmin) / (inmax - inmin)
        t = outmin - inmin * s
        s, t = jnp.broadcast_arrays(s, t)
        zeros = jnp.zeros(s.shape[:-1], jnp.float32)
        row0 = jnp.stack([s[..., 0], zeros, t[..., 0]], axis=-1)
        row1 = jnp.stack([zeros, s[..., 1], t[..., 1]], axis=-1)
        return Affine2d(jnp.stack([row0, row1], axis=-2))

    @staticmethod
    def _batch_shape(translations, angles, scales):
        if translations is not None:
            return jnp.asarray(translations).shape[:-1]
        if angles is not None:
            return jnp.asarray(angles).shape
        if scales is not None:
            return jnp.asarray(scales).shape
        raise ValueError("Need at least one argument")

    # ---- accessors ---------------------------------------------------------
    def tensor(self) -> jax.Array:
        return self.m

    def tensor33(self) -> jax.Array:
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], self.m.dtype), self.m.shape[:-2] + (1, 3)
        )
        return jnp.concatenate([self.m, bottom], axis=-2)

    @property
    def R(self) -> jax.Array:
        return self.m[..., :2, :2]

    @property
    def R33(self) -> jax.Array:
        r = jnp.zeros(self.m.shape[:-2] + (3, 3), self.m.dtype)
        r = r.at[..., :2, :2].set(self.R)
        return r.at[..., 2, 2].set(1.0)

    @property
    def T(self) -> jax.Array:
        return self.m[..., :2, 2]

    @property
    def shape(self):
        """Batch part of the shape (excluding the trailing 2x3)."""
        return self.m.shape[:-2]

    # ---- algebra -----------------------------------------------------------
    def __matmul__(self, other: "Affine2d") -> "Affine2d":
        rot = matmul_hp(self.R, other.R)
        t = matvecmul(self.R, other.T) + self.T
        t = jnp.broadcast_to(t, rot.shape[:-2] + (2,))
        return Affine2d(jnp.concatenate([rot, t[..., None]], axis=-1))

    def inv(self) -> "Affine2d":
        a, b = self.m[..., 0, 0], self.m[..., 0, 1]
        c, d = self.m[..., 1, 0], self.m[..., 1, 1]
        det = a * d - b * c
        inv_r = (
            jnp.stack(
                [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
            )
            / det[..., None, None]
        )
        t = -matvecmul(inv_r, self.T)
        return Affine2d(jnp.concatenate([inv_r, t[..., None]], axis=-1))

    @property
    def scales(self) -> jax.Array:
        """Recover the isotropic scaling factor: |R|_F / sqrt(2)."""
        return jnp.linalg.norm(self.m[..., :, :2], axis=(-2, -1)) / SQRT2

    @property
    def det(self) -> jax.Array:
        a, b = self.m[..., 0, 0], self.m[..., 0, 1]
        c, d = self.m[..., 1, 0], self.m[..., 1, 1]
        return a * d - b * c

    # ---- reshaping ----------------------------------------------------------
    def __getitem__(self, val) -> "Affine2d":
        return Affine2d(self.m[val])

    def reshape(self, shape) -> "Affine2d":
        return Affine2d(self.m.reshape(tuple(shape) + (2, 3)))

    def broadcast_to(self, shape) -> "Affine2d":
        return Affine2d(jnp.broadcast_to(self.m, tuple(shape) + (2, 3)))

    def repeat(self, size) -> "Affine2d":
        return Affine2d(jnp.tile(self.m, tuple(size) + (1, 1)))


def roi_normalizing_transform(roi: jax.Array) -> Affine2d:
    """Transform mapping an (x0, y0, x1, y1) roi onto [-1, 1]^2."""
    assert roi.shape[-1] == 4
    out_min = jnp.full(roi.shape[:-1] + (2,), -1.0, jnp.float32)
    out_max = jnp.full(roi.shape[:-1] + (2,), 1.0, jnp.float32)
    return Affine2d.range_remap_2d(roi[..., :2], roi[..., 2:], out_min, out_max)
