"""Batched offline face-model fitting recovers synthetic ground truth.

Covers scripts/fit_face_model.py (the reference's FitFaceModel notebooks have
no tests; here the fit is validated by round-tripping poses through the
deformable head model)."""

import sys
from os.path import dirname, join, realpath

import h5py
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

sys.path.insert(0, join(dirname(realpath(__file__)), "..", "scripts"))


def test_fit_recovers_synthetic_poses(tmp_path, rng, monkeypatch):
    import jax.numpy as jnp

    from neuralnet_tracker_traincode_tpu.models.components import (
        DeformableHeadKeypoints,
        PosedDeformableHead,
    )
    from neuralnet_tracker_traincode_tpu.ops.rotrepr import QuatRepr

    N = 12
    rots = Rotation.from_euler("XYZ", rng.uniform(-35, 35, (N, 3)), degrees=True)
    quats = rots.as_quat().astype(np.float32)
    coord = np.concatenate(
        [rng.uniform(100, 140, (N, 2)), rng.uniform(40, 60, (N, 1))], axis=-1
    ).astype(np.float32)
    shape = (rng.randn(N, 50) * 0.3).astype(np.float32)
    head = PosedDeformableHead(DeformableHeadKeypoints())
    pts = np.asarray(head(jnp.asarray(coord), QuatRepr(jnp.asarray(quats)), jnp.asarray(shape)))
    pt2d = pts[..., :2] + rng.randn(N, 68, 2).astype(np.float32) * 0.2
    rois = np.concatenate([pt2d.min(axis=1), pt2d.max(axis=1)], axis=-1).astype(np.float32)

    fn = str(tmp_path / "fit.h5")
    with h5py.File(fn, "w") as f:
        f.create_dataset("pt2d_68", data=pt2d.astype(np.float32))
        f.create_dataset("rois", data=rois)

    import fit_face_model

    monkeypatch.setattr(
        sys, "argv", ["fit_face_model.py", fn, "--steps", "800", "--lr", "0.08"]
    )
    fit_face_model.main()

    with h5py.File(fn, "r") as f:
        q = np.asarray(f["2dfit_v3/quats"])
        c = np.asarray(f["2dfit_v3/coords"])
        assert f["2dfit_v3/pt3d_68"].shape == (N, 68, 3)
        assert f["2dfit_v3/shapeparams"].dtype == np.float16

    rot_err = (Rotation.from_quat(q).inv() * Rotation.from_quat(quats)).magnitude()
    assert np.rad2deg(np.mean(rot_err)) < 6.0, np.rad2deg(rot_err)
    assert np.mean(np.linalg.norm(c[:, :2] - coord[:, :2], axis=-1)) < 3.0
    assert np.mean(np.abs(c[:, 2] - coord[:, 2]) / coord[:, 2]) < 0.1
