"""Rotation alignment schemes for protocol-correct pose evaluation.

Contract: `trackertraincode/eval.py:443-544`:
 - PerspectiveCorrector: premultiplies the pose with a look-at rotation derived
   from the crop position and the camera FOV (Biwi protocol).
 - compute_opal_paper_alignment: per-cluster Karcher-mean alignment (opal23).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from neuralnet_tracker_traincode_tpu.ops import quaternion as Q


def _compute_displacement(mean_rot: Rotation, rots: Rotation):
    return (mean_rot.inv() * rots).as_rotvec()


def compute_mean_rotation(rots: Rotation, tol=0.0001, max_iter=100000) -> Rotation:
    """Iterative Karcher mean over rotations within the pi/2 ball."""
    rots = rots[rots.magnitude() < np.pi / 2]
    mean_rot = rots[0]
    for _ in range(max_iter):
        displacement = np.mean(_compute_displacement(mean_rot, rots), axis=0)
        if np.linalg.norm(displacement) < tol:
            break
        mean_rot = mean_rot * Rotation.from_rotvec(displacement)
    return mean_rot


def compute_opal_paper_alignment(pose_pred, pose_target, cluster_ids) -> np.ndarray:
    """Per-cluster alignment of predictions to targets; returns updated quats."""
    pose_pred = np.asarray(pose_pred)
    pose_target = np.asarray(pose_target)
    cluster_ids = np.asarray(cluster_ids)
    out = np.empty_like(pose_pred)
    for id_ in np.unique(cluster_ids):
        mask = cluster_ids == id_
        pred_rot = Rotation.from_quat(pose_pred[mask])
        target_rot = Rotation.from_quat(pose_target[mask])
        align_rot = compute_mean_rotation(target_rot.inv() * pred_rot)
        pred_rot = pred_rot * align_rot.inv()
        out[mask] = pred_rot.as_quat().astype(pose_pred.dtype)
    return out


def make_look_at_matrix(pos: jax.Array) -> jax.Array:
    """Rotation whose z-axis aligns with `pos`, x constrained to the horizontal plane."""
    z = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], pos.dtype), z.shape)
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.stack([x, y, z], axis=-1)


class PerspectiveCorrector:
    def __init__(self, fov: float):
        self._fov = fov
        self.f = 1.0 / math.tan(fov * math.pi / 180.0 * 0.5)

    def corrected_rotation(self, image_sizes, coord, pose):
        """Premultiply the pose with the look-at rotation of the crop position.

        image_sizes: (B, 2) [W, H]; coord: (B, 3); pose: (B, 4) quats.
        """
        image_sizes = jnp.asarray(image_sizes, jnp.float32)
        coord = jnp.asarray(coord)
        pose = jnp.asarray(pose)
        xy_image = coord[..., :2]
        half = 0.5 * image_sizes
        xy_normalized = (xy_image - half) / half[..., 0:1]
        fs = jnp.broadcast_to(jnp.asarray(self.f), xy_normalized[..., :1].shape)
        xyz = jnp.concatenate([xy_normalized, fs], axis=-1)
        m = make_look_at_matrix(xyz)
        return Q.mult(Q.from_matrix(m), pose)
