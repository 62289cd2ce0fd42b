"""Polymorphic rotation representations (quaternion / 3x3 matrix).

Contract: `trackertraincode/neuralnets/rotrepr.py`. Both classes are pytrees so
they can be returned from jitted model forwards.
"""

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.ops import quaternion as Q
from neuralnet_tracker_traincode_tpu.ops import rot6d
from neuralnet_tracker_traincode_tpu.ops.mathfn import smoothclip0, matmul_hp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QuatRepr:
    value: jax.Array  # (..., 4) real-last

    def tree_flatten(self):
        return (self.value,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def rotate_points(self, pts: jax.Array) -> jax.Array:
        return Q.rotate(self.value[..., None, :], pts)

    def mult(self, other: "QuatRepr") -> "QuatRepr":
        return QuatRepr(Q.mult(self.value, other.value))

    @classmethod
    def make_rotate_x(cls, angle: jax.Array) -> "QuatRepr":
        half = 0.5 * jnp.asarray(angle)
        zeros = jnp.zeros(half.shape + (2,), half.dtype)
        return QuatRepr(
            jnp.concatenate([jnp.sin(half)[..., None], zeros, jnp.cos(half)[..., None]], axis=-1)
        )

    @classmethod
    def from_features(cls, z: jax.Array) -> Tuple["QuatRepr", jax.Array]:
        """Features -> (normalized quats, unnormalized quats).

        The real component is forced positive via smoothclip0 because -q is the
        same rotation as q (easier to learn; reference `rotrepr.py:36-48`).
        """
        unnormalized = jnp.concatenate(
            [z[..., Q.iijk], smoothclip0(z[..., Q.iw :])], axis=-1
        )
        return QuatRepr(Q.normalized(unnormalized)), unnormalized

    def as_quat(self) -> jax.Array:
        return self.value

    @property
    def shape(self):
        return self.value.shape[:-1]

    def __getitem__(self, idx) -> "QuatRepr":
        return QuatRepr(self.value[idx])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Mat33Repr:
    value: jax.Array  # (..., 3, 3)

    def tree_flatten(self):
        return (self.value,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def rotate_points(self, pts: jax.Array) -> jax.Array:
        return jnp.swapaxes(matmul_hp(self.value, jnp.swapaxes(pts, -2, -1)), -2, -1)

    def mult(self, other: "Mat33Repr") -> "Mat33Repr":
        return Mat33Repr(matmul_hp(self.value, other.value))

    @classmethod
    def make_rotate_x(cls, angle: jax.Array) -> "Mat33Repr":
        angle = jnp.asarray(angle)
        sn, cs = jnp.sin(angle), jnp.cos(angle)
        zeros = jnp.zeros_like(angle)
        ones = jnp.ones_like(angle)
        m = jnp.stack(
            [ones, zeros, zeros, zeros, cs, -sn, zeros, sn, cs], axis=-1
        ).reshape(angle.shape + (3, 3))
        return Mat33Repr(m)

    @classmethod
    def from_6drepr_features(cls, z: jax.Array) -> "Mat33Repr":
        return Mat33Repr(rot6d.tomatrix(z))

    def as_quat(self) -> jax.Array:
        return Q.from_matrix(self.value)

    @property
    def shape(self):
        return self.value.shape[:-2]

    def __getitem__(self, idx) -> "Mat33Repr":
        return Mat33Repr(self.value[idx])


RotationRepr = Union[QuatRepr, Mat33Repr]
