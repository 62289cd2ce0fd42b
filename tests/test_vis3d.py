"""Unconditional tests of the numpy mesh rasterizer behind FaceRender.

The reference's `FaceRender` needs pyrender + the non-distributable BFM blob
(`/root/reference/trackertraincode/vis3d.py:50`); this repo's default
backend is the dependency-free `rasterize_mesh`, so the render path runs in
default CI: analytic coverage/depth/occlusion/shading checks plus the full
`FaceRender` software pipeline on a stub head model. The $BFM_PATH-gated
model plumbing is covered separately in tests/test_bfm_gated.py.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from neuralnet_tracker_traincode_tpu import vis3d


def test_single_triangle_coverage_and_depth():
    # right triangle covering the lower-left of a 32x32 image, z ramp 1 -> 5
    verts = np.array(
        [[2.0, 2.0, 1.0], [30.0, 2.0, 5.0], [2.0, 30.0, 5.0]], np.float32
    )
    tris = np.array([[0, 1, 2]])
    color, depth = vis3d.rasterize_mesh(verts, tris, (32, 32))
    assert color.shape == (32, 32, 3) and depth.shape == (32, 32)
    inside = depth > 0
    # interior pixel well inside; outside pixel empty
    assert inside[5, 5] and not inside[31, 31]
    # a constant-shaded flat triangle: all covered pixels share one color
    cov_colors = color[inside]
    assert (cov_colors == cov_colors[0]).all()
    assert cov_colors[0].any()  # non-black
    # depth interpolates: apex (2,2) nearer than the hypotenuse side
    assert depth[2, 2] < depth[2, 28] <= 5.0 + 1e-3
    assert abs(depth[2, 2] - 1.0) < 0.5


def test_depth_test_smaller_z_wins():
    # two full-coverage triangles at constant z; the z=1 one must win
    def tri_at(z, flip):
        t = np.array([[-40.0, -40.0, z], [90.0, -40.0, z], [-40.0, 90.0, z]], np.float32)
        return t if not flip else t[::-1]  # winding must not matter (double-sided)

    verts = np.concatenate([tri_at(4.0, False), tri_at(1.0, True)])
    tris = np.array([[0, 1, 2], [3, 4, 5]])
    base = (100, 150, 200)
    color, depth = vis3d.rasterize_mesh(verts, tris, (16, 16), base_color=base)
    assert np.allclose(depth, 1.0, atol=1e-5)
    # both triangles are viewer-facing planes -> identical shading; the test
    # is that depth comes from the NEARER one everywhere.
    assert (color > 0).all()


def test_vertex_normals_flat_square():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    n = vis3d.estimate_vertex_normals(verts, tris)
    assert n.shape == (4, 3)
    assert np.allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)
    assert np.allclose(n[:, :2], 0.0, atol=1e-6)


def test_shading_varies_with_surface_orientation():
    # a "tent": two triangles with opposite slopes get different intensities
    verts = np.array(
        [
            [0.0, 0.0, 2.0], [16.0, 0.0, 0.0], [32.0, 0.0, 2.0],
            [0.0, 32.0, 2.0], [16.0, 32.0, 0.0], [32.0, 32.0, 2.0],
        ],
        np.float32,
    )
    tris = np.array([[0, 1, 4], [0, 4, 3], [1, 2, 5], [1, 5, 4]])
    color, depth = vis3d.rasterize_mesh(
        verts, tris, (32, 32), light_dir=(1.0, 0.0, -1.0)
    )
    left = color[16, 4].astype(int).sum()
    right = color[16, 28].astype(int).sum()
    assert depth[16, 4] > 0 and depth[16, 28] > 0
    assert left != right  # asymmetric light hits the two slopes differently


class _StubHead:
    """Minimal stand-in for FullBFMModel's mesh surface (unit tetrahedron)."""

    scaled_vertices = np.array(
        [[0.0, -1.0, -0.5], [-1.0, 0.8, 0.0], [1.0, 0.8, 0.0], [0.0, 0.2, 0.9]],
        np.float32,
    )
    scaled_bases = np.zeros((50, 4, 3), np.float32)
    scaled_tri = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)


def test_facerender_software_end_to_end(monkeypatch):
    monkeypatch.setattr(vis3d, "_require_full_mesh", lambda: _StubHead())
    r = vis3d.FaceRender(backend="software")
    rot = Rotation.from_euler("y", 20, degrees=True)
    r.set(xy=(32.0, 32.0), scale=20.0, rot=rot, shapeparams=np.zeros(50), image_shape=(64, 64))
    color, depth = r.render()
    assert color.shape == (64, 64, 3) and depth.shape == (64, 64)
    cover = (depth != 0).mean()
    assert 0.05 < cover < 0.9  # the head occupies part of the frame
    assert (color[depth != 0] > 0).any()
    # pose responds to the inputs: moving the head moves the coverage
    r.set(xy=(8.0, 8.0), scale=6.0, rot=rot, shapeparams=np.zeros(50), image_shape=(64, 64))
    color2, depth2 = r.render()
    assert (depth2 != 0).mean() < cover


def test_facerender_pyrender_backend_gated(monkeypatch):
    pytest.importorskip("pyrender")
    monkeypatch.setattr(vis3d, "_require_full_mesh", lambda: _StubHead())
    vis3d.FaceRender(backend="pyrender")
