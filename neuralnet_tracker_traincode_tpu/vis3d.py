"""3D face-mesh visualization.

Contract: `trackertraincode/vis3d.py` (FaceRender: posed BFM mesh rendered
over the camera frame with pyrender). pyrender/trimesh are not part of the
baked environment and the full BFM mesh requires the non-distributable
`bfm_noneck_v3.pkl`; both dependencies are checked lazily. A dependency-free
matplotlib scatter fallback (`plot_posed_keypoints_3d`) covers the common
debugging use.
"""

import numpy as np
from scipy.spatial.transform import Rotation


def _require_full_mesh():
    from neuralnet_tracker_traincode_tpu.data.host_transforms import _try_load_full_model

    model = _try_load_full_model()
    if model is None:
        raise RuntimeError(
            "FaceRender needs the full BFM mesh; point $BFM_PATH at bfm_noneck_v3.pkl"
        )
    return model


class FaceRender:
    """Render the posed deformable head over an image (pyrender backend)."""

    def __init__(self):
        import pyrender  # noqa: F401 - optional dependency

        self._pyrender = pyrender
        self.model = _require_full_mesh()
        self.scene = pyrender.Scene(
            ambient_light=[0.3, 0.3, 0.3], bg_color=[0.0, 0.0, 0.0, 0.0]
        )
        self.camera_node = self.scene.add(
            pyrender.OrthographicCamera(xmag=1.0, ymag=1.0, znear=0.1, zfar=10000.0)
        )
        light = pyrender.DirectionalLight(color=np.ones(3), intensity=3.0)
        self.scene.add(light)
        self._mesh_node = None
        self._renderer = None

    def _posed_vertices(self, xy, scale, rot: Rotation, shapeparams):
        verts = self.model.scaled_vertices + np.einsum(
            "k,kvd->vd", np.asarray(shapeparams), self.model.scaled_bases
        )
        out = rot.apply(verts) * scale
        out[:, :2] += np.asarray(xy)
        return out

    def set(self, xy, scale, rot, shapeparams, image_shape):
        """Update the mesh pose; image_shape = (H, W)."""
        pyrender = self._pyrender
        import trimesh

        verts = self._posed_vertices(xy, scale, rot, shapeparams)
        tri = self.model.scaled_tri
        mesh = trimesh.Trimesh(vertices=verts, faces=tri, process=False)
        if self._mesh_node is not None:
            self.scene.remove_node(self._mesh_node)
        self._mesh_node = self.scene.add(pyrender.Mesh.from_trimesh(mesh, smooth=True))
        h, w = image_shape
        cam = self.camera_node.camera
        cam.xmag = w * 0.5
        cam.ymag = h * 0.5
        pose = np.eye(4)
        pose[:3, 3] = [w * 0.5, h * 0.5, 1000.0]
        # Flip y/z for the image coordinate convention.
        pose[:3, :3] = np.diag([1.0, -1.0, -1.0])
        self.scene.set_pose(self.camera_node, pose)
        self._image_shape = image_shape

    def render(self):
        pyrender = self._pyrender
        h, w = self._image_shape
        if self._renderer is None:
            self._renderer = pyrender.OffscreenRenderer(w, h)
        color, depth = self._renderer.render(self.scene)
        return color, depth


def plot_posed_keypoints_3d(ax, coord, pose_quat, shapeparams=None):
    """Dependency-free 3D scatter of the posed 68-keypoint model."""
    import jax.numpy as jnp

    from neuralnet_tracker_traincode_tpu.models.components import (
        DeformableHeadKeypoints,
        PosedDeformableHead,
    )
    from neuralnet_tracker_traincode_tpu.ops.rotrepr import QuatRepr

    head = PosedDeformableHead(DeformableHeadKeypoints())
    if shapeparams is None:
        shapeparams = np.zeros((50,), np.float32)
    pts = np.asarray(
        head(
            jnp.asarray(coord, jnp.float32)[None],
            QuatRepr(jnp.asarray(pose_quat, jnp.float32)[None]),
            jnp.asarray(shapeparams, jnp.float32)[None],
        )
    )[0]
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=4.0)
    return pts
