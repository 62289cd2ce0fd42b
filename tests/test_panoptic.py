"""dsprocess_panoptic on a tiny synthetic sequence (geometry + schema check).

The reference has no test for its 1.1k-line panoptic pipeline; this builds a
fake CMU-layout sequence (calibration json, coco19 skeleton, meshTrack fit,
face70 landmarks, 1-frame hdVideo) and checks the written h5 piece.
"""

import json
import sys
from os.path import dirname, join, realpath

import h5py
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

sys.path.insert(0, join(dirname(realpath(__file__)), "..", "scripts"))

import dsprocess_panoptic as dp


def _make_sequence(root):
    seq = root / "testseq"
    (seq / "hdPose3d_stage1_coco19").mkdir(parents=True)
    (seq / "meshTrack_face").mkdir()
    (seq / "hdFace3d").mkdir()
    (seq / "hdVideos").mkdir()

    calib = {
        "cameras": [
            {
                "panel": 0, "node": 0, "resolution": [1920, 1080],
                "K": [[1000.0, 0.0, 960.0], [0.0, 1000.0, 540.0], [0.0, 0.0, 1.0]],
                "R": np.eye(3).tolist(),
                "t": [[0.0], [0.0], [300.0]],
                "distCoef": [0.0, 0.0, 0.0, 0.0, 0.0],
            },
            # non-HD panel must be ignored
            {
                "panel": 3, "node": 1, "resolution": [640, 480],
                "K": np.eye(3).tolist(), "R": np.eye(3).tolist(),
                "t": [[0.0], [0.0], [1.0]], "distCoef": [0.0] * 5,
            },
        ]
    }
    with open(seq / "calibration_testseq.json", "w") as f:
        json.dump(calib, f)

    # Skeleton: ears wide apart so the projected bbox clears MIN_BBOX_SIZE.
    joints = np.zeros((19, 4))
    joints[:, 3] = 0.9
    joints[dp.LEYE, :3] = (5.0, 5.0, 0.0)
    joints[dp.REYE, :3] = (-5.0, 5.0, 0.0)
    joints[dp.LEAR, :3] = (12.0, 0.0, 0.0)
    joints[dp.REAR, :3] = (-12.0, 0.0, 0.0)
    joints[dp.NOSE, :3] = (0.0, 4.0, -2.0)
    with open(seq / "hdPose3d_stage1_coco19" / "body3DScene_00000000.json", "w") as f:
        json.dump({"bodies": [{"id": 0, "joints19": joints.ravel().tolist()}]}, f)

    # meshTrack: id 5 lines before the 'Face' header, rotvec 2 lines after.
    lines = ["hdr", "hdr", "0", "x", "x", "x", "x", "Face 0", "x", "0.0 0.0 0.0"]
    with open(seq / "meshTrack_face" / "meshTrack_00000000.txt", "w") as f:
        f.write("\n".join(lines))

    # face70 landmarks in a ball around the skull center, all visible in cam 0.
    rng = np.random.RandomState(0)
    center = np.asarray([0.0, 2.5, 0.0])
    lmks = center + rng.uniform(-3, 3, (70, 3))
    with open(seq / "hdFace3d" / "faceRecon3D_hd00000000.json", "w") as f:
        json.dump(
            {"people": [{"id": 0, "face70": {
                "landmarks": lmks.ravel().tolist(),
                "visibility": [[0]] * 70,
            }}]},
            f,
        )

    import cv2

    vw = cv2.VideoWriter(
        str(seq / "hdVideos" / "hd_00_00.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (1920, 1080),
    )
    frame = rng.randint(0, 80, (1080, 1920, 3)).astype(np.uint8)  # textured bg
    # bright textured "face" blob (the crop must not look uniform)
    frame[400:700, 800:1100] = 150 + rng.randint(0, 80, (300, 300, 3)).astype(np.uint8)
    ok = vw.isOpened()
    vw.write(frame)
    vw.release()
    return seq, ok


def test_write_dataset_piece(tmp_path):
    seq, video_ok = _make_sequence(tmp_path)
    if not video_ok:
        pytest.skip("cv2 VideoWriter lacks mp4v support in this build")
    out = tmp_path / "piece.h5"
    dp.write_dataset_piece(out, seq, cam_id=0)
    assert out.exists()

    with h5py.File(out, "r") as f:
        assert f["quats"].shape == (1, 4)
        assert f["rois"].shape == (1, 4)
        assert f["coords"].shape == (1, 3)
        assert f["images"].shape[0] == 1
        assert f["cam"][0] == 0 and f["frame"][0] == 0
        quat = np.asarray(f["quats"][0], np.float64)
        xys = np.asarray(f["coords"][0], np.float64)
        roi = np.asarray(f["rois"][0], np.float64)

    # Identity fit rotation + y-flip correction => quat ~ (1, 0, 0, 0) real-last
    # (small perspective look-at correction allowed).
    assert abs(abs(quat[0]) - 1.0) < 0.02
    # Projected size: 0.5 * 1.4 * |ear distance| * f/z = 16.8 * 1000/300 = 56.
    assert 45 < xys[2] < 70
    assert roi[2] - roi[0] > dp.MIN_BBOX_SIZE
    # Center: eye midpoint (0, 5, 0) -> roughly mid-crop after offsetting.
    assert np.isfinite(xys).all()


def test_confidence_gating():
    joints = np.zeros((19, 4))  # zero confidence everywhere
    body = dp.Body(
        0, joints, np.zeros((70, 3)), np.zeros((31, 70), bool), Rotation.identity()
    )
    assert not body.head_pose.valid


def test_project_pose_scale_matches_pinhole():
    cam = dp.Camera({
        "panel": 0, "node": 0, "resolution": [1920, 1080],
        "K": [[1000.0, 0.0, 960.0], [0.0, 1000.0, 540.0], [0.0, 0.0, 1.0]],
        "R": np.eye(3).tolist(), "t": [[0.0], [0.0], [200.0]],
        "distCoef": [0.0] * 5,
    })
    pose = dp.Pose(Rotation.identity(), np.asarray([0.0, 0.0, 0.0]), 10.0)
    proj = cam.project_pose(pose)
    assert proj.valid
    np.testing.assert_allclose(proj.t, [960.0, 540.0], atol=1e-3)
    np.testing.assert_allclose(proj.size, 10.0 * 1000.0 / 200.0, rtol=1e-3)


def test_shrinked_videos_and_vis(tmp_path):
    seq, video_ok = _make_sequence(tmp_path)
    if not video_ok:
        pytest.skip("cv2 VideoWriter lacks mp4v support in this build")
    # "Shrinked" videos are same-resolution recompressions living in a sibling
    # dir; reading them is a flag flip.
    import shutil

    shutil.copytree(seq / "hdVideos", seq / "hdVideosShrinked")
    out = tmp_path / "piece_sv.h5"
    dp.write_dataset_piece(out, seq, cam_id=0, use_shrinked_videos=True)
    with h5py.File(out, "r") as f:
        assert f["quats"].shape == (1, 4)

    png = tmp_path / "vis.png"
    dp.vis_frame(seq, 0, 0, str(png))
    assert png.exists() and png.stat().st_size > 1000
