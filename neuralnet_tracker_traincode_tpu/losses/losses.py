"""Per-sample loss terms for pose estimation.

Contract: `trackertraincode/neuralnets/losses.py`. Every loss is a callable
(pred_dict, sample_dict) -> per-sample loss of shape (B,), pure jnp.
"""

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.facemodel import keypoints68 as kpts68
from neuralnet_tracker_traincode_tpu.models.components import GaussianMixture
from neuralnet_tracker_traincode_tpu.ops import quaternion as Q
from neuralnet_tracker_traincode_tpu.ops import rot6d

SimpleLossSwitch = Literal["l2", "l1", "smooth_l1"]


def _smooth_l1(pred, target, beta: float):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def elementwise_loss(kind: SimpleLossSwitch, pred, target):
    if kind == "l2":
        return jnp.square(pred - target)
    if kind == "l1":
        return jnp.abs(pred - target)
    if kind == "smooth_l1":
        return _smooth_l1(pred, target, beta=0.01)
    raise ValueError(kind)


def smooth_geodesic_distance(pred_quat, target_quat):
    smooth_zone = 1.0 * jnp.pi / 180.0  # one degree
    normed_delta = Q.geodesicdistance(pred_quat, target_quat)
    return _smooth_l1(normed_delta, jnp.zeros_like(normed_delta), beta=smooth_zone) / jnp.pi


class QuatPoseLoss:
    def __init__(self, loss: Literal["approx_distance", "smooth_geodesic"] = "approx_distance", prefix=""):
        self._prefix = prefix
        self._fn = {"approx_distance": Q.distance, "smooth_geodesic": smooth_geodesic_distance}[loss]

    def __call__(self, pred, sample):
        return self._fn(pred[self._prefix + "rot"].value, sample["pose"])


class Rot6dReprLoss:
    def __call__(self, pred, sample):
        target = Q.tomatrix(sample["pose"])
        return rot6d.rotation_distance_loss(pred["rot"].value, target)


class Rot6dNormalizationSoftConstraint:
    def __call__(self, pred, sample):
        return rot6d.orthonormality_loss(pred["unnormalized_6drepr"])


class PoseSizeLoss:
    def __init__(self, loss: SimpleLossSwitch, prefix=""):
        self._prefix = prefix
        self._kind = loss

    def __call__(self, pred, sample):
        return elementwise_loss(
            self._kind, pred[self._prefix + "coord"][..., 2], sample["coord"][..., 2]
        )


class PoseXYLoss:
    def __init__(self, loss: SimpleLossSwitch, prefix=""):
        self._prefix = prefix
        self._kind = loss

    def __call__(self, pred, sample):
        return jnp.mean(
            elementwise_loss(
                self._kind, pred[self._prefix + "coord"][..., :2], sample["coord"][..., :2]
            ),
            axis=-1,
        )


class ShapeParameterLoss:
    def __call__(self, pred, sample):
        return jnp.mean(jnp.square(pred["shapeparam"] - sample["shapeparam"]), axis=-1)


class ShapePlausibilityLoss:
    """-log p(shape) under a diagonal GMM prior, fudged by 0.001 / K.

    The GMM is loaded from an HDF5 file (`facemodel/shapeparams_gmm.h5` format of
    the reference, `losses.py:100-113`); fit one with scripts/fit_shapeparams_gmm.py.
    """

    def __init__(self, gmm: GaussianMixture):
        self.gmm = gmm
        self.fudge_factor = 0.001 / gmm.n_components

    @staticmethod
    def from_hdf5(path: str) -> "ShapePlausibilityLoss":
        return ShapePlausibilityLoss(GaussianMixture.from_hdf5(path))

    def __call__(self, pred, sample):
        x = pred["shapeparam"].astype(jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
        return (-self.gmm(x) * self.fudge_factor).astype(jnp.float32)


class QuaternionNormalizationSoftConstraint:
    def __init__(self, prefix=""):
        self._prefix = prefix

    def __call__(self, pred, sample):
        unnormalized = pred[self._prefix + "unnormalized_quat"]
        norm = jnp.linalg.norm(unnormalized, axis=-1)
        return jnp.square(1.0 - norm)


class Points3dLoss:
    def __init__(
        self,
        loss: SimpleLossSwitch,
        pointdimension: int = 3,
        chin_weight=1.0,
        eye_weights=0.0,
        prefix="",
    ):
        assert pointdimension in (2, 3)
        self._prefix = prefix
        self._kind = loss
        self.pointdimension = pointdimension
        pointweights = np.ones((68,), dtype=np.float32)
        pointweights[kpts68.chin_left[:-1]] = chin_weight
        pointweights[kpts68.chin_right[1:]] = chin_weight
        pointweights[kpts68.eye_not_corners] = eye_weights
        # Keep as numpy: eagerly-created device arrays captured as jit
        # constants trigger a catastrophic slow path on the TPU backend.
        self.pointweights = pointweights

    def __call__(self, pred, sample):
        p = pred[self._prefix + "pt3d_68"][..., : self.pointdimension]
        t = sample["pt3d_68"][..., : self.pointdimension]
        pointwise = jnp.sum(elementwise_loss(self._kind, p, t), axis=-1)
        return jnp.mean(pointwise * self.pointweights[None, :], axis=-1)


class BoxLoss:
    def __init__(self, loss: SimpleLossSwitch, dataname="roi"):
        self.dataname = dataname
        self._kind = loss

    def __call__(self, pred, sample):
        return jnp.mean(
            elementwise_loss(self._kind, pred[self.dataname], sample[self.dataname]), axis=-1
        )


def _bce_with_logits(logits, target):
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


class HasFaceLoss:
    def __call__(self, pred, sample):
        return _bce_with_logits(pred["hasface_logits"], sample["hasface"])


##########################################
# Localizer losses
##########################################


class LocalizerProbLoss:
    def __call__(self, pred, sample):
        return _bce_with_logits(pred[:, 0], sample["hasface"])


class LocalizerBoxLoss:
    def __call__(self, pred, sample):
        err = _smooth_l1(pred[:, 1:], sample["roi"], beta=0.1)
        return jnp.mean(sample["hasface"][:, None] * err, axis=-1)
