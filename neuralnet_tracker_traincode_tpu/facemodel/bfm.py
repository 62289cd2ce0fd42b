"""Deformable head keypoint model (BFM / 3DDFA `bfm_noneck_v3` variant).

Contract: `trackertraincode/facemodel/bfm.py`. The reference loads the full
~38k-vertex mesh from `bfm_noneck_v3.pkl` (a git-LFS blob that is NOT
distributable with this repo) but the training/eval paths only ever use the
68 keypoint rows (`modelcomponents.py:66-68`). We therefore store a small
derived artifact: `assets/bfm_keypoints_subset.npz` with

    keypts      (68, 3)   head-radius-unit mean keypoint positions
    w_shp       (40, 68, 3) scaled shape eigvectors at the keypoints
    w_exp       (10, 68, 3) scaled expression eigvectors at the keypoints

Resolution order:
1. `assets/bfm_keypoints_subset.npz` if present (generate it from the real
   pkl with `scripts/convert_bfm.py`, or the fitted fallback with
   `scripts/make_bfm_fallback.py`).
2. A full `bfm_noneck_v3.pkl` pointed at by $BFM_PATH (converted on the fly;
   also enables the full-mesh API used by 3D visualization).
"""

import functools
import os
import pickle
from os.path import dirname, isfile, join

import numpy as np

_assets_dir = join(dirname(__file__), "assets")
SUBSET_ARTIFACT = join(_assets_dir, "bfm_keypoints_subset.npz")

# Keypoint index fixups of the reference (`bfm.py:38-42`): the eye landmarks
# are remapped so closed-eye mesh deformations stay consistent.
LEFT_EYE_NEW = [1959, 3887, 5048, 6216, 3513, 4674]
RIGHT_EYE_NEW = [9956, 11223, 12384, 14327, 11495, 12656]

# Recentering offset applied to the raw 3DDFA mean shape (`bfm.py:69`).
ACTUAL_CENTER = np.array([0.0, -0.26, -0.9], dtype=np.float32)


class FullBFMModel:
    """Full-mesh model loaded from the original 3DDFA pickle (optional)."""

    def __init__(self, pkl_path: str, shape_dim=40, exp_dim=10):
        with open(pkl_path, "rb") as f:
            bfm = pickle.load(f)
        self.u = bfm.get("u").astype(np.float32)
        self.w_shp = bfm.get("w_shp").astype(np.float32)[..., :shape_dim]
        self.w_exp = bfm.get("w_exp").astype(np.float32)[..., :exp_dim]
        self.vertexcount = self.u.shape[0] // 3
        self.keypoints = bfm.get("keypoints").astype(np.int64)[::3] // 3
        self.keypoints[[36, 37, 38, 39, 41, 40]] = LEFT_EYE_NEW
        self.keypoints[[42, 43, 44, 45, 47, 46]] = RIGHT_EYE_NEW
        tri_path = join(_assets_dir, "tri.pkl")
        self.tri = None
        if isfile(tri_path):
            with open(tri_path, "rb") as f:
                tri = pickle.load(f)
            self.tri = np.ascontiguousarray(tri.T).astype(np.int32)

    @property
    def scaled_shp_base(self):
        w_shp = 20.0 * self.w_shp.reshape((self.vertexcount, 3, -1))
        w_shp = w_shp.transpose([2, 0, 1])
        return w_shp * np.array([[[1.0, -1.0, -1.0]]], dtype=np.float32)

    @property
    def scaled_exp_base(self):
        w_exp = 5.0e-5 * self.w_exp.reshape((self.vertexcount, 3, -1))
        w_exp = w_exp.transpose([2, 0, 1])
        return w_exp * np.array([[[1.0, -1.0, -1.0]]], dtype=np.float32)

    @property
    def scaled_bases(self):
        """(num eigvecs, num vertices, 3)"""
        return np.concatenate([self.scaled_shp_base, self.scaled_exp_base], axis=0)

    @property
    def scaled_vertices(self):
        """(num vertices, 3), head-radius units, recentered."""
        vertices = self.u.reshape((-1, 3)) * 1.0e-5 * np.array(
            [[1.0, -1.0, -1.0]], dtype=np.float32
        )
        vertices = vertices - ACTUAL_CENTER[None, :]
        return np.ascontiguousarray(vertices)

    @property
    def scaled_tri(self):
        assert self.tri is not None, "tri.pkl not available"
        return np.ascontiguousarray(self.tri[..., [2, 1, 0]])

    def export_keypoint_subset(self, out_path: str = SUBSET_ARTIFACT):
        keypts = self.scaled_vertices[self.keypoints]
        bases = self.scaled_bases[:, self.keypoints, :]
        np.savez_compressed(
            out_path,
            keypts=keypts.astype(np.float32),
            w_shp=bases[:40].astype(np.float32),
            w_exp=bases[40:].astype(np.float32),
            source="bfm_noneck_v3.pkl",
        )
        return out_path


class BFMModel:
    """68-keypoint deformable model: keypts + 50 eigvectors at the keypoints."""

    def __init__(self, shape_dim=40, exp_dim=10):
        keypts, w_shp, w_exp, source = _load_subset_arrays()
        assert shape_dim <= w_shp.shape[0] and exp_dim <= w_exp.shape[0]
        self.keypts = keypts  # (68, 3)
        self.w_shp = w_shp[:shape_dim]  # (40, 68, 3)
        self.w_exp = w_exp[:exp_dim]  # (10, 68, 3)
        self.source = source

    @property
    def scaled_bases(self):
        """(50, 68, 3): shape then expression eigvectors."""
        return np.concatenate([self.w_shp, self.w_exp], axis=0)

    @property
    def num_eigvecs(self):
        return self.w_shp.shape[0] + self.w_exp.shape[0]

    @property
    def is_authentic(self) -> bool:
        """True when derived from the real bfm_noneck_v3 blob (vs fitted fallback)."""
        return self.source == "bfm_noneck_v3.pkl"


@functools.lru_cache(1)
def _load_subset_arrays():
    if isfile(SUBSET_ARTIFACT):
        with np.load(SUBSET_ARTIFACT) as f:
            return (
                f["keypts"].astype(np.float32),
                f["w_shp"].astype(np.float32),
                f["w_exp"].astype(np.float32),
                str(f["source"]),
            )
    bfm_path = os.environ.get("BFM_PATH")
    if bfm_path and isfile(bfm_path):
        full = FullBFMModel(bfm_path)
        keypts = full.scaled_vertices[full.keypoints]
        bases = full.scaled_bases[:, full.keypoints, :]
        return keypts, bases[:40], bases[40:], "bfm_noneck_v3.pkl"
    raise FileNotFoundError(
        f"No face model artifact at {SUBSET_ARTIFACT} and $BFM_PATH unset. "
        "Run scripts/make_bfm_fallback.py (fitted fallback) or "
        "scripts/convert_bfm.py with the real bfm_noneck_v3.pkl."
    )
