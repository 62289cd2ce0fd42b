"""Functional model components: 2.5D rigid transform, deformable keypoints,
soft-argmax, gaussian mixture log-pdf.

Contract: `trackertraincode/neuralnets/modelcomponents.py`. These are pure
functions over arrays; the trainable wrappers live in the flax modules.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.facemodel.bfm import BFMModel
from neuralnet_tracker_traincode_tpu.ops.rotrepr import RotationRepr


def rigid_transformation_25d(r: RotationRepr, t: jax.Array, s: jax.Array, points: jax.Array):
    """2.5D rigid transform: rotate, scale (all axes), translate in xy only.

    r: rotation representation (normalized), batch shape (...,)
    t: (..., 2) translation, s: (..., 1) scale, points: (..., N, 3).
    z-coordinates keep the scaled-rotated value (no z offset).
    """
    tmp = r.rotate_points(points)
    tmp = tmp * s[..., None, :]
    xy = tmp[..., :2] + t[..., None, :]
    return jnp.concatenate([xy, tmp[..., 2:]], axis=-1)


class DeformableHeadKeypoints:
    """Linear blend-shape keypoint model over the BFM 68-keypoint subset."""

    def __init__(self, num_shape=40, num_expr=10):
        self.num_eigvecs = num_shape + num_expr
        self.num_shape = num_shape
        self.num_expr = num_expr
        full = BFMModel(num_shape, num_expr)
        self.keypts = jnp.asarray(full.keypts)  # (68, 3)
        self.keyeigvecs = jnp.asarray(full.scaled_bases)  # (50, 68, 3)

    def __call__(self, shapeparams: jax.Array) -> jax.Array:
        """(..., 50) -> (..., 68, 3)"""
        local = jnp.einsum(
            "...k,kpd->...pd",
            shapeparams,
            self.keyeigvecs,
            precision=jax.lax.Precision.HIGHEST,
        )
        return local + self.keypts


class PosedDeformableHead:
    def __init__(self, deformable_head: DeformableHeadKeypoints):
        self.deformable_head = deformable_head

    def __call__(self, coord: jax.Array, rots: RotationRepr, params: jax.Array) -> jax.Array:
        local = self.deformable_head(params)
        return rigid_transformation_25d(rots, coord[..., :2], coord[..., 2:], local)


def center_of_mass(x: jax.Array, half_size) -> jax.Array:
    """Spatial soft-argmax over (B, H, W) probability maps, domain [-1, 1]*half_size."""
    B, H, W = x.shape
    px = jnp.linspace(-1.0, 1.0, W)[None, :]
    py = jnp.linspace(-1.0, 1.0, H)[:, None]
    p = jnp.stack([jnp.broadcast_to(px, (H, W)), jnp.broadcast_to(py, (H, W))])
    mean = half_size * jnp.sum(x[:, None, :, :] * p[None, ...], axis=(2, 3))
    return mean, p


def center_of_mass_and_std(x: jax.Array, half_size, eps=1.0e-4) -> Tuple[jax.Array, jax.Array]:
    mean, p = center_of_mass(x, half_size)
    diff = p[None, ...] - mean[..., None, None]
    std = jnp.sqrt(jnp.sum(x[:, None, :, :] * diff * diff, axis=(2, 3)) + eps)
    return mean, std


def pascal_kernel_2d(kernel_size: int) -> np.ndarray:
    """Normalized 2D binomial (Pascal) kernel for anti-aliased downsampling."""
    row = np.asarray([1.0])
    for _ in range(kernel_size - 1):
        row = np.convolve(row, [1.0, 1.0])
    k = np.outer(row, row)
    return (k / k.sum()).astype(np.float32)


class GaussianMixture:
    """Diagonal-covariance gaussian mixture log-likelihood (pure jnp)."""

    def __init__(self, weights, means, cov):
        weights = np.asarray(weights)
        means = np.asarray(means)
        cov = np.asarray(cov)
        assert weights.shape == means.shape[:1] == cov.shape[:1]
        assert means.shape == cov.shape
        self.cov = cov
        # numpy, not device arrays: eager device-array constants captured in
        # jit trigger a catastrophic slow path on the TPU backend.
        self.weights = weights
        self.means = means
        self.scales_inv = 1.0 / np.sqrt(cov)
        D = means.shape[-1]
        self.norm_constant = 0.5 * D * np.log(2 * np.pi)

    @property
    def n_components(self) -> int:
        return self.weights.shape[0]

    @staticmethod
    def from_hdf5(f) -> "GaussianMixture":
        import h5py

        if isinstance(f, str):
            with h5py.File(f, "r") as file:
                return GaussianMixture.from_hdf5(file)
        assert f.attrs["covariance_type"] == "diag"
        return GaussianMixture(
            weights=f["weights"][...], means=f["means"][...], cov=f["cov"][...]
        )

    @staticmethod
    def from_sklearn(gmm) -> "GaussianMixture":
        return GaussianMixture(weights=gmm.weights_, means=gmm.means_, cov=gmm.covariances_)

    def save_to_hdf5(self, f, group_name=None):
        g = f.create_group(group_name) if group_name is not None else f
        g.create_dataset("weights", data=np.asarray(self.weights))
        g.create_dataset("means", data=np.asarray(self.means))
        g.create_dataset("cov", data=np.asarray(self.cov))
        g.attrs["covariance_type"] = "diag"
        return g

    def __call__(self, x: jax.Array) -> jax.Array:
        """Log-likelihood, x shape (..., D)."""
        delta = x[..., None, :] - self.means
        weight_term = np.log(self.weights)
        exponential_term = -0.5 * jnp.sum(jnp.square(delta * self.scales_inv), axis=-1)
        normalization_term = jnp.sum(jnp.log(self.scales_inv), axis=-1) - self.norm_constant
        return jax.scipy.special.logsumexp(
            weight_term + exponential_term + normalization_term, axis=-1
        )
