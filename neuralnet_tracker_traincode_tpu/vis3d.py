"""3D face-mesh visualization.

Contract: `trackertraincode/vis3d.py` (FaceRender: posed BFM mesh rendered
over the camera frame; reference backend is pyrender at
`/root/reference/trackertraincode/vis3d.py:50`). pyrender/trimesh are not
part of the baked environment, so the default backend here is a small numpy
z-buffer barycentric rasterizer with Gouraud shading (`rasterize_mesh`) that
renders in any environment; pyrender remains an optional fast path
(`FaceRender(backend="pyrender")`). The full BFM mesh still requires the
non-distributable `bfm_noneck_v3.pkl` (checked lazily via $BFM_PATH); a
dependency-free matplotlib scatter fallback (`plot_posed_keypoints_3d`)
covers the common debugging use without it.

Conventions (matching the repo-wide image/keypoint frame, see
`facemodel/bfm.py`): x right, y DOWN, z INTO the image — nearer surfaces
have SMALLER z (the BFM nose tip is the most negative z on a frontal face).
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


def estimate_vertex_normals(vertices: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Area-weighted mean vertex normals, (V, 3) unit vectors.

    Equivalent of the reference's trimesh-based
    `_estimate_vertex_normals` (`/root/reference/trackertraincode/vis3d.py:23`)
    without the trimesh dependency: accumulate each face's (area-scaled)
    cross-product normal onto its three vertices, then normalize.
    """
    v = np.asarray(vertices, np.float64)
    t = np.asarray(tris, np.int64)
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])  # (F, 3)
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, t[:, k], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return (vn / np.maximum(norm, 1e-12)).astype(np.float32)


def rasterize_mesh(
    vertices: np.ndarray,  # (V, 3) image-space: x right, y down, z = depth
    tris: np.ndarray,  # (F, 3) vertex indices
    image_shape,  # (H, W)
    light_dir=(0.3, -0.25, -1.0),  # toward the scene; -z = from the viewer
    ambient: float = 0.35,
    diffuse: float = 0.65,
    base_color=(140, 160, 210),
    tile_tris: int = 4096,
):
    """Numpy z-buffer barycentric rasterizer with Gouraud shading.

    Returns `(color, depth)` like pyrender's OffscreenRenderer: color is
    (H, W, 3) uint8 (black where empty), depth is (H, W) float32 with 0.0
    where no fragment landed and the fragment's interpolated z elsewhere
    (SMALLER z = nearer wins the depth test).

    Vectorized per triangle-batch: every triangle in a batch rasterizes over
    a shared bounding-box-sized pixel grid; fragments from all batches run
    one global depth test (lexsort by pixel id then z, keep the first).
    Shading is double-sided (|n.l|, like the reference's doubleSided
    material).
    """
    H, W = int(image_shape[0]), int(image_shape[1])
    v = np.asarray(vertices, np.float32)
    t = np.asarray(tris, np.int64).reshape(-1, 3)
    color_img = np.zeros((H, W, 3), np.uint8)
    depth_img = np.zeros((H, W), np.float32)
    if len(t) == 0 or len(v) == 0:
        return color_img, depth_img

    vn = estimate_vertex_normals(v, t)
    l = np.asarray(light_dir, np.float32)
    l = l / np.linalg.norm(l)
    # per-vertex Gouraud intensity, double-sided
    intensity = np.clip(ambient + diffuse * np.abs(vn @ l), 0.0, 1.0)  # (V,)
    base = np.asarray(base_color, np.float32)

    frag_pix, frag_z, frag_rgb = [], [], []
    for lo in range(0, len(t), tile_tris):
        tb = t[lo : lo + tile_tris]
        p = v[tb]  # (F, 3, 3): per-tri vertex positions
        xy = p[..., :2]
        x0 = np.clip(np.floor(xy[..., 0].min(1)), 0, W - 1).astype(np.int64)
        y0 = np.clip(np.floor(xy[..., 1].min(1)), 0, H - 1).astype(np.int64)
        x1 = np.clip(np.ceil(xy[..., 0].max(1)), 0, W - 1).astype(np.int64)
        y1 = np.clip(np.ceil(xy[..., 1].max(1)), 0, H - 1).astype(np.int64)
        bw = int(np.max(x1 - x0) + 1)
        bh = int(np.max(y1 - y0) + 1)
        if bw <= 0 or bh <= 0:
            continue
        # pixel centers of each triangle's bbox grid (broadcast (F, bh, bw))
        gx = x0[:, None, None] + np.arange(bw, dtype=np.int64)[None, None, :]
        gy = y0[:, None, None] + np.arange(bh, dtype=np.int64)[None, :, None]
        inb = (gx <= x1[:, None, None]) & (gy <= y1[:, None, None])
        px = gx.astype(np.float32) + 0.5
        py = gy.astype(np.float32) + 0.5

        ax, ay = xy[:, 0, 0], xy[:, 0, 1]
        bx, by = xy[:, 1, 0], xy[:, 1, 1]
        cx, cy = xy[:, 2, 0], xy[:, 2, 1]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)  # signed, (F,)
        ok = np.abs(area) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, area, 1.0), 0.0)[:, None, None]
        # barycentric weights at pixel centers
        w0 = ((bx[:, None, None] - px) * (cy[:, None, None] - py)
              - (by[:, None, None] - py) * (cx[:, None, None] - px)) * inv
        w1 = ((cx[:, None, None] - px) * (ay[:, None, None] - py)
              - (cy[:, None, None] - py) * (ax[:, None, None] - px)) * inv
        w2 = 1.0 - w0 - w1
        cover = (
            inb
            & ok[:, None, None]
            & (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        )
        if not cover.any():
            continue
        fi, yi, xi = np.nonzero(cover)
        wz = np.stack([w0[fi, yi, xi], w1[fi, yi, xi], w2[fi, yi, xi]], -1)  # (N, 3)
        z = np.einsum("nk,nk->n", wz, p[fi, :, 2])
        it = np.einsum("nk,nk->n", wz, intensity[tb[fi]])
        frag_pix.append((y0[fi] + yi) * W + (x0[fi] + xi))
        frag_z.append(z)
        frag_rgb.append(np.clip(it[:, None] * base[None, :], 0, 255).astype(np.uint8))

    if not frag_pix:
        return color_img, depth_img
    pix = np.concatenate(frag_pix)
    z = np.concatenate(frag_z)
    rgb = np.concatenate(frag_rgb)
    # global depth test: nearest (smallest z) fragment per pixel
    order = np.lexsort((z, pix))
    pix, z, rgb = pix[order], z[order], rgb[order]
    first = np.ones(len(pix), bool)
    first[1:] = pix[1:] != pix[:-1]
    pix, z, rgb = pix[first], z[first], rgb[first]
    color_img.reshape(-1, 3)[pix] = rgb
    depth_img.reshape(-1)[pix] = z
    return color_img, depth_img


class FaceRender:
    """Render the posed deformable head over an image.

    backend="auto" uses pyrender when importable and falls back to the
    built-in numpy rasterizer otherwise; "software"/"pyrender" force one.
    """

    def __init__(self, backend: str = "auto"):
        assert backend in ("auto", "software", "pyrender")
        self._pyrender = None
        if backend in ("auto", "pyrender"):
            try:
                import pyrender

                self._pyrender = pyrender
            except ImportError:
                if backend == "pyrender":
                    raise
        self.model = _require_full_mesh()
        self._mesh_node = None
        self._renderer = None
        self.scene = None
        if self._pyrender is not None:
            pyrender = self._pyrender
            self.scene = pyrender.Scene(
                ambient_light=[0.3, 0.3, 0.3], bg_color=[0.0, 0.0, 0.0, 0.0]
            )
            self.camera_node = self.scene.add(
                pyrender.OrthographicCamera(xmag=1.0, ymag=1.0, znear=0.1, zfar=10000.0)
            )
            light = pyrender.DirectionalLight(color=np.ones(3), intensity=3.0)
            self.scene.add(light)

    def _posed_vertices(self, xy, scale, rot: Rotation, shapeparams):
        verts = self.model.scaled_vertices + np.einsum(
            "k,kvd->vd", np.asarray(shapeparams), self.model.scaled_bases
        )
        out = rot.apply(verts) * scale
        out[:, :2] += np.asarray(xy)
        return out

    def set(self, xy, scale, rot, shapeparams, image_shape):
        """Update the mesh pose; image_shape = (H, W)."""
        verts = self._posed_vertices(xy, scale, rot, shapeparams)
        tri = self.model.scaled_tri
        self._image_shape = image_shape
        if self._pyrender is None:
            self._verts, self._tri = verts, tri
            return
        pyrender = self._pyrender
        import trimesh

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

    def render(self):
        h, w = self._image_shape
        if self._pyrender is None:
            return rasterize_mesh(self._verts, self._tri, (h, w))
        pyrender = self._pyrender
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
