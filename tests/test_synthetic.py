"""The synthetic marker dataset must be self-consistent: rendered markers land
on the labeled landmark positions and the file round-trips through the
standard pose pipeline (it feeds the convergence benchmark)."""

import numpy as np

from neuralnet_tracker_traincode_tpu.data.synthetic import (
    make_labels,
    render_marker_images,
    write_synthetic_pose_dataset,
)


def test_markers_land_on_landmarks():
    quats, coords, pt3d, shapeparams, rois = make_labels(4, 160, seed=11)
    imgs = render_marker_images(pt3d, coords, 160, chunk=4)
    assert imgs.shape == (4, 160, 160) and imgs.dtype == np.uint8
    for i in range(4):
        y, x = np.unravel_index(np.argmax(imgs[i]), imgs[i].shape)
        d = np.min(np.hypot(pt3d[i, :, 0] - x, pt3d[i, :, 1] - y))
        assert d < 3.0, d
        # roi is the landmark bbox
        lo = pt3d[i, :, :2].min(axis=0)
        hi = pt3d[i, :, :2].max(axis=0)
        np.testing.assert_allclose(rois[i], np.concatenate([lo, hi]), atol=1e-4)
    # quats normalized, sizes positive
    np.testing.assert_allclose(np.linalg.norm(quats, axis=-1), 1.0, atol=1e-5)
    assert (coords[:, 2] > 0).all()


def test_hdf5_roundtrip_through_pose_dataset(tmp_path):
    from neuralnet_tracker_traincode_tpu.data.pose_dataset import Hdf5PoseDataset

    path = str(tmp_path / "synth.h5")
    write_synthetic_pose_dataset(path, 6, 96, seed=2)
    ds = Hdf5PoseDataset(path)
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape[:2] == (96, 96)
    assert s["pose"].shape == (4,)
    assert s["pt3d_68"].shape == (68, 3)
    assert s["shapeparam"].shape == (50,)
    assert ds.max_image_hw == (96, 96)
