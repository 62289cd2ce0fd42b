"""Dataset converters on synthetic source fixtures (zips/dirs built in-test).

Validates the full conversion chain of the PRIMARY training dataset: AFLW
euler conversion, matlab y-flip, head-radius scaling, eye-center origin
shift, 3DDFA shape-parameter rescaling, 3D landmark reconstruction,
per-identity sequence grouping, and subset filtering — without the real
(multi-GB) archive.
"""

import io
import sys
import zipfile
from os.path import dirname, join, realpath

import h5py
import numpy as np
import scipy.io

sys.path.insert(0, join(dirname(realpath(__file__)), "..", "scripts"))

import dsprocess_300wlp as dp

from neuralnet_tracker_traincode_tpu.utils import aflw_rotation_conversion


def _mat_bytes(d):
    buf = io.BytesIO()
    scipy.io.savemat(buf, d)
    return buf.getvalue()


def _make_zip(path):
    import cv2

    rng = np.random.RandomState(5)
    img = (rng.rand(450, 450) * 255).astype(np.uint8)
    _, jpg = cv2.imencode(".JPEG", img)

    def annot(pitch, yaw, roll):
        return _mat_bytes({
            "Pose_Para": np.asarray(
                [[pitch, yaw, roll, 220.0, 200.0, 0.0, 0.001]], np.float64
            ),
            "Shape_Para": rng.randn(199, 1) * 1e4,
            "Exp_Para": rng.randn(29, 1) * 0.5,
        })

    lmk = _mat_bytes({"pts_2d": rng.rand(68, 2) * 450})
    files = {
        "300W_LP/AFW/AFW_134212_1_0.mat": annot(0.1, 0.2, -0.1),
        "300W_LP/AFW/AFW_134212_1_1.mat": annot(0.1, 0.9, -0.1),
        "300W_LP/HELEN/HELEN_7_0.mat": annot(-0.2, 0.0, 0.3),
    }
    with zipfile.ZipFile(path, "w") as zf:
        for fn, blob in files.items():
            zf.writestr(fn, blob)
            zf.writestr(fn[:-4] + ".jpg", jpg.tobytes())
            parts = fn.split("/")
            zf.writestr(
                "/".join(parts[:-2] + ["landmarks", parts[-2], parts[-1][:-4] + "_pts.mat"]),
                lmk,
            )
    return path


def test_300wlp_conversion_roundtrip(tmp_path):
    src = _make_zip(str(tmp_path / "300wlp.zip"))
    out = str(tmp_path / "300wlp.h5")
    dp.generate_hdf5_dataset(src, out, count=None, subset="both", full_face_bounding_box=False)

    with h5py.File(out, "r") as f:
        assert f["images"].shape[0] == 3
        # Grouped by identity: AFW_134212_1 has two rotated variants.
        np.testing.assert_array_equal(f["sequence_starts"][...], [0, 2, 3])
        quats = f["quats"][...]
        coords = f["coords"][...]
        np.testing.assert_allclose(np.linalg.norm(quats, axis=-1), 1.0, atol=1e-5)
        assert f["pt3d_68"].shape == (3, 68, 3)
        assert f["shapeparams"].shape == (3, 50)
        assert f["shapeparams"].dtype == np.float16

        # First sample: quaternion = AFLW euler conversion of (0.1, 0.2, -0.1).
        expected_rot = aflw_rotation_conversion(0.1, 0.2, -0.1)
        dot = abs(np.dot(quats[0], expected_rot.as_quat()))
        assert dot > 0.9999, dot
        # Head radius: 0.5 * scale / 224 * width * 1e5 = 100.4 px.
        np.testing.assert_allclose(coords[0, 2], 100.446, atol=0.5)
        # y was flipped from matlab convention (h - 200 = 250) then shifted by
        # the eye-center offset (fraction of the head radius).
        assert abs(coords[0, 1] - 250.0) < 0.5 * coords[0, 2]

    # Subset filtering: 'original' keeps only the _0 variants.
    out2 = str(tmp_path / "orig.h5")
    dp.generate_hdf5_dataset(src, out2, count=None, subset="original",
                             full_face_bounding_box=False)
    with h5py.File(out2, "r") as f:
        assert f["images"].shape[0] == 2
        np.testing.assert_array_equal(f["sequence_starts"][...], [0, 1, 2])


def test_300wlp_loads_through_pose_dataset(tmp_path):
    from neuralnet_tracker_traincode_tpu.data.pose_dataset import Hdf5PoseDataset

    src = _make_zip(str(tmp_path / "z.zip"))
    out = str(tmp_path / "z.h5")
    dp.generate_hdf5_dataset(src, out, count=None, subset="both", full_face_bounding_box=False)
    ds = Hdf5PoseDataset(out)
    s = ds[0]
    assert s["image"].shape[:2] == (450, 450)
    assert s["pose"].shape == (4,)
    assert s["pt3d_68"].shape == (68, 3)
    assert np.isfinite(np.asarray(s["roi"])).all()


def test_aflw2k_conversion(tmp_path):
    """dsprocess_aflw2k: GT 3D landmarks from the .mat (z flipped,
    depth-centered), full-head bbox, no sequences."""
    import cv2

    import dsprocess_aflw2k as da

    from neuralnet_tracker_traincode_tpu.data.preprocessing import compute_keypoints

    rng = np.random.RandomState(6)
    img = (rng.rand(450, 450) * 255).astype(np.uint8)
    _, jpg = cv2.imencode(".JPEG", img)
    rot = aflw_rotation_conversion(0.15, -0.3, 0.05)
    # GT landmarks consistent with the pose (sanity-check tolerance is 0.4*radius).
    radius = 0.5 * 0.001 / 224.0 * 450 * 1e5
    raw_pt3d = compute_keypoints(
        np.zeros(40), np.zeros(10), radius, rot, 220.0, 450.0 - 200.0
    )
    raw_pt3d = np.array(raw_pt3d)
    raw_pt3d[2] *= -1  # converter flips z back

    blob = _mat_bytes({
        "Pose_Para": np.asarray([[0.15, -0.3, 0.05, 220.0, 200.0, 0.0, 0.001]], np.float64),
        "Shape_Para": np.zeros((199, 1)),
        "Exp_Para": np.zeros((29, 1)),
        "pt3d_68": raw_pt3d,
    })
    src = str(tmp_path / "aflw.zip")
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("AFLW2000/image00002.mat", blob)
        zf.writestr("AFLW2000/image00002.jpg", jpg.tobytes())

    out = str(tmp_path / "aflw.h5")
    da.generate_hdf5_dataset(src, out)
    with h5py.File(out, "r") as f:
        assert f["images"].shape[0] == 1
        quats = f["quats"][...]
        np.testing.assert_allclose(
            abs(np.dot(quats[0], rot.as_quat())), 1.0, atol=1e-5
        )
        pt3d = f["pt3d_68"][0]
        assert pt3d.shape == (68, 3)
        # Depth-centering: mean eye-corner z sits at zero.
        eye_z = pt3d[[45, 42, 39, 36], 2].mean()
        np.testing.assert_allclose(eye_z, 0.0, atol=1e-3)
        assert "sequence_starts" not in f


def test_synface_conversion(tmp_path, monkeypatch):
    """dsprocess_synface: 68-of-70 landmarks with zero z, roi from the
    skin+nose segmentation, tiny faces filtered."""
    import cv2

    import dsprocess_synface as ds

    rng = np.random.RandomState(8)

    def png(arr):
        _, buf = cv2.imencode(".PNG", arr)
        return buf.tobytes()

    img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
    seg = np.zeros((128, 128), np.uint8)
    seg[30:100, 25:95] = ds.SKIN  # 70x70 face -> kept
    seg_small = np.zeros((128, 128), np.uint8)
    seg_small[60:80, 60:80] = ds.SKIN  # 20x20 -> filtered out
    lmk = "\n".join(f"{x:.2f} {y:.2f}" for x, y in rng.rand(70, 2) * 128)

    src = str(tmp_path / "synface.zip")
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("000000.png", png(img))
        zf.writestr("000000_seg.png", png(seg))
        zf.writestr("000000_ldmks.txt", lmk)
        zf.writestr("000001.png", png(img))
        zf.writestr("000001_seg.png", png(seg_small))
        zf.writestr("000001_ldmks.txt", lmk)

    out = str(tmp_path / "synface.h5")
    monkeypatch.setattr(sys, "argv", ["dsprocess_synface.py", src, out])
    ds.main()

    with h5py.File(out, "r") as f:
        assert f["images"].shape[0] == 1  # small face filtered
        pts = f["pt3d_68"][...]
        assert pts.shape == (1, 68, 3)
        np.testing.assert_allclose(pts[..., 2], 0.0)  # z padded with zeros
        np.testing.assert_allclose(f["rois"][0], [25, 30, 94, 99], atol=1.0)


def test_wflw_conversion(tmp_path):
    """dsprocess_wflw: 98->68 landmark conversion, crop transform, splits."""
    import cv2

    import dsprocess_wflw as dw

    # 98->68 conversion on index-coded points: x = index, y = 1000 + index.
    lmk98 = np.stack([np.arange(98, dtype=np.float64),
                      1000.0 + np.arange(98)], axis=0)  # (2, 98)
    lmk68 = dw.cvt_landmarks_68pt(lmk98)
    assert lmk68.shape == (68, 2)
    np.testing.assert_allclose(lmk68[:17, 0], np.arange(0, 33, 2))  # chin subsample
    np.testing.assert_allclose(lmk68[17, 0], 33)                    # brow corner
    np.testing.assert_allclose(lmk68[18, 0], 0.5 * (34 + 41))       # brow pair avg
    np.testing.assert_allclose(lmk68[27:36, 0], np.arange(51, 60))  # nose
    np.testing.assert_allclose(lmk68[37, 0], 0.5 * (61 + 62))       # eye midpoint
    np.testing.assert_allclose(lmk68[48:, 0], np.arange(76, 96))    # mouth

    # End-to-end over a tiny source tree.
    src = tmp_path / "wflw_src"
    (src / "WFLW_annotations" / "list_98pt_rect_attr_train_test").mkdir(parents=True)
    (src / "WFLW_images" / "0--sub").mkdir(parents=True)
    rng = np.random.RandomState(3)
    cv2.imwrite(str(src / "WFLW_images" / "0--sub" / "a.png"),
                (rng.rand(300, 300, 3) * 255).astype(np.uint8))
    pts = (rng.rand(98, 2) * 100 + 100).ravel()
    line = " ".join(f"{v:.3f}" for v in pts) + " 100 100 250 240 0 0 0 0 0 0 0--sub/a.png\n"
    for split in ("train", "test"):
        with open(src / "WFLW_annotations" / "list_98pt_rect_attr_train_test"
                  / f"list_98pt_rect_attr_{split}.txt", "w") as f:
            f.write(line)

    dw.generate_hdf5_dataset(str(src), str(tmp_path), count=None)
    for split in ("train", "test"):
        with h5py.File(str(tmp_path / f"wflw_{split}.h5"), "r") as f:
            assert f["images"].shape[0] == 1
            assert f["pt2d_68"].shape == (1, 68, 2)
            assert f["pt2d_68"].dtype == np.float16
            # Crop offsets applied consistently: roi width is preserved
            # (scale 1 for faces below the downscale threshold).
            roi = f["rois"][0].astype(np.float64)
            np.testing.assert_allclose(roi[2] - roi[0], 150.0, atol=0.5)


def test_lapa_conversion(tmp_path):
    """dsprocess_lapa: 106->68 conversion (quadratic chin re-interp), megaface
    name filter, landmark-roi crops."""
    import cv2

    import dsprocess_lapa as dl

    rng = np.random.RandomState(12)
    src = tmp_path / "lapa_src"
    (src / "train" / "images").mkdir(parents=True)
    (src / "train" / "landmarks").mkdir(parents=True)
    img = (rng.rand(280, 280, 3) * 255).astype(np.uint8)
    lmk106 = rng.rand(106, 2) * 160 + 60
    for name in ("12345", "notmegafacename"):
        cv2.imwrite(str(src / "train" / "images" / f"{name}.jpg"), img)
        with open(src / "train" / "landmarks" / f"{name}.txt", "w") as f:
            f.write("106\n" + "\n".join(f"{x:.3f} {y:.3f}" for x, y in lmk106))

    out = str(tmp_path / "lapa.h5")
    with h5py.File(out, "w") as f:
        dl.do_conversion(str(src), f, None, only_megaface=True, refiner=None)
    with h5py.File(out, "r") as f:
        assert f["images"].shape[0] == 1  # non-numeric name filtered out
        pts = f["pt2d_68"][...]
        assert pts.shape == (1, 68, 2) and pts.dtype == np.float16

    # Conversion semantics on index-coded landmarks (straight-line chin, so the
    # quadratic re-interpolation is exact).
    coded = np.stack([np.arange(106, dtype=np.float64),
                      np.arange(106, dtype=np.float64)], axis=-1)
    out68 = dl.cvt_landmarks_68pt(coded)
    np.testing.assert_allclose(out68[0, 0], 1.5, atol=1e-6)   # clipped chin start
    np.testing.assert_allclose(out68[16, 0], 30.5, atol=1e-6)  # clipped chin end
    np.testing.assert_allclose(out68[17, 0], 33)               # brow corner
    np.testing.assert_allclose(out68[48:, 0], np.arange(84, 104))  # mouth


def test_widerface_conversion(tmp_path):
    """dsprocess_widerface: single-face filtering, face + background crops,
    hasface flags (localizer training data)."""
    import cv2

    import dsprocess_widerface as dwf

    rng = np.random.RandomState(4)

    def jpg(arr):
        _, buf = cv2.imencode(".JPEG", arr)
        return buf.tobytes()

    img = (rng.rand(360, 480, 3) * 255).astype(np.uint8)
    annot = {
        "train": (
            "0--a/one.jpg\n1\n100 80 120 140 0 0 0 0 0 0\n"      # single face -> used
            "0--a/two.jpg\n2\n10 10 50 50 0 0 0 0 0 0\n200 40 60 70 0 0 0 0 0 0\n"  # filtered
        ),
        "val": "1--b/v.jpg\n1\n150 60 100 120 0 0 0 0 0 0\n",
    }
    with zipfile.ZipFile(str(tmp_path / "wider_face_split.zip"), "w") as zf:
        zf.writestr("wider_face_split/wider_face_train_bbx_gt.txt", annot["train"])
        zf.writestr("wider_face_split/wider_face_val_bbx_gt.txt", annot["val"])
    with zipfile.ZipFile(str(tmp_path / "WIDER_train.zip"), "w") as zf:
        zf.writestr("WIDER_train/images/0--a/one.jpg", jpg(img))
        zf.writestr("WIDER_train/images/0--a/two.jpg", jpg(img))
    with zipfile.ZipFile(str(tmp_path / "WIDER_val.zip"), "w") as zf:
        zf.writestr("WIDER_val/images/1--b/v.jpg", jpg(img))

    out = str(tmp_path / "widerfacessingle.h5")
    dwf.generate_hdf5_dataset(str(tmp_path), out, count=None, maxsize=640)

    with h5py.File(out, "r") as f:
        # 2 single-face images (1 train + 1 val) x (face crop + background crop)
        assert f["images"].shape[0] == 4
        hasface = f["hasface"][...]
        assert hasface.sum() == 2 and (~hasface).sum() == 2
        rois = f["rois"][...]
        assert np.isfinite(rois).all()
        # Face rois sit inside their crops with the annotated extents.
        for i in range(4):
            x0, y0, x1, y1 = rois[i]
            assert x1 > x0 and y1 > y0


def test_biwi_conversion_with_opal_annotations(tmp_path):
    """dsprocess_biwi: camera-extrinsics chain, pinhole projection of the head
    center/size, opal23 annotation boxes, per-video sequence_starts."""
    import cv2

    import dsprocess_biwi as db

    rng = np.random.RandomState(13)

    def png(arr):
        _, buf = cv2.imencode(".PNG", arr)
        return buf.tobytes()

    img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    pose_txt = "1 0 0\n0 1 0\n0 0 1\n\n50 -20 1000 \n"
    cal_txt = "\n" * 6 + "1 0 0\n0 1 0\n0 0 1\n\n0 0 0 \n"

    src = str(tmp_path / "biwi.zip")
    with zipfile.ZipFile(src, "w") as zf:
        for frame in ("00003", "00004"):
            zf.writestr(f"faces_0/01/frame_{frame}_rgb.png", png(img))
            zf.writestr(f"faces_0/01/frame_{frame}_pose.txt", pose_txt)
        zf.writestr("faces_0/01/rgb.cal", cal_txt)

    # opal23-style annotation: the header's FIRST token is a stray index name
    # (the converter shifts column names left by one, dsprocess_biwi.py).
    ann = str(tmp_path / "biwi_ann.txt")
    with open(ann, "w") as f:
        f.write("idx;image;tl_x;tl_y;br_x;br_y\n")
        for frame in ("00003", "00004"):
            f.write(f"kinect_head_pose_db/01/frame_{frame}_rgb.png;200;150;400;370;\n")

    out = str(tmp_path / "biwi.h5")
    db.generate_hdf5_dataset(src, out, opal_annotation=ann, localizer=None)

    with h5py.File(out, "r") as f:
        assert f["images"].shape[0] == 2
        np.testing.assert_array_equal(f["sequence_starts"][...], [0, 2])
        np.testing.assert_allclose(f["rois"][0], [200, 150, 400, 370])
        coords = f["coords"][...]
        # Pinhole projection of (50, -20, 1000) with fov 65, 640x480:
        fproj = 1.0 / np.tan(np.deg2rad(65) * 0.5)
        ex = (fproj * 50 / 1000 + 1) * 0.5 * 640
        ey = (fproj * (-20) / 1000 * (640 / 480) + 1) * 0.5 * 480
        size = 640 * fproj * 100.0 / 1000 * 0.5
        np.testing.assert_allclose(coords[0, 2], size, rtol=1e-5)
        # Head-center offset displaces xy by a rotation-dependent fraction of size.
        assert abs(coords[0, 0] - ex) < 0.5 * size
        assert abs(coords[0, 1] - ey) < 0.5 * size
        # Identity pose through identity extrinsics -> identity quaternion.
        np.testing.assert_allclose(abs(f["quats"][0][3]), 1.0, atol=1e-6)


def test_300vw_conversion(tmp_path):
    """dsprocess_300vw: per-frame .pts annotations + .avi decode, grayscale
    crops around the across-frames roi, sequence_starts per video."""
    import cv2

    import dsprocess_300vw as dv

    rng = np.random.RandomState(14)
    # Write a 2-frame avi.
    avi_path = str(tmp_path / "vid.avi")
    vw = cv2.VideoWriter(avi_path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (320, 240))
    if not vw.isOpened():
        import pytest

        pytest.skip("cv2 VideoWriter lacks MJPG support")
    frames = [(rng.rand(240, 320, 3) * 255).astype(np.uint8) for _ in range(2)]
    for fr in frames:
        vw.write(fr)
    vw.release()

    def pts(points):
        body = "\n".join(f"{x:.3f} {y:.3f}" for x, y in points)
        return f"version: 1\nn_points: 68\n{{\n{body}\n}}\n"

    lmks = rng.rand(2, 68, 2) * 100 + 80
    src = str(tmp_path / "300vw.zip")
    with zipfile.ZipFile(src, "w") as zf:
        zf.write(avi_path, "300VW_Dataset/007/vid.avi")
        for i in range(2):
            zf.writestr(f"300VW_Dataset/007/annot/{i + 1:06d}.pts", pts(lmks[i]))

    out = str(tmp_path / "300vw.h5")
    with zipfile.ZipFile(src) as zf, h5py.File(out, "w") as f:
        infos = dv.discover_items(zf)
        assert set(infos) == {"007"}
        dv.do_conversion(zf, list(infos.values()), f, refiner=None)

    with h5py.File(out, "r") as f:
        assert f["images"].shape[0] == 2
        np.testing.assert_array_equal(f["sequence_starts"][...], [0, 2])
        assert f["pt2d_68"].shape == (2, 68, 2)
        # Landmarks stay inside the stored crop.
        from neuralnet_tracker_traincode_tpu.data.preprocessing import imdecode

        img = imdecode(f["images"][0].tobytes())
        pts_ = f["pt2d_68"][0].astype(np.float64)
        assert (pts_ >= -1).all()
        assert (pts_[:, 0] <= img.shape[1] + 1).all()
        assert (pts_[:, 1] <= img.shape[0] + 1).all()


def test_replicantface_conversion(tmp_path, monkeypatch):
    """dsprocess_replicantface: modelview/projection pose extraction, mesh
    landmark subsets, seg-roi + brightness validity filtering."""
    import cv2

    import dsprocess_replicantface as dr

    rng = np.random.RandomState(15)
    src = tmp_path / "repl_src"
    src.mkdir()

    # Vertex-index bookkeeping: 100-vertex head, 68 landmark ids, 32 face ids.
    np.savez(src / "head_indices.npz", indices=np.arange(100))
    np.savez(src / "landmark_indices.npz", indices=np.arange(68))
    np.savez(src / "face_indices.npz", indices=np.arange(68, 100))

    f = 2.0  # focal
    projection = np.array([
        [f, 0, 0, 0], [0, f, 0, 0], [0, 0, 1.0, 0], [0, 0, 1.0, 0],
    ])
    # Blender-style modelview: head 2 m in front of the camera (view-space -z).
    modelview = np.eye(4)
    modelview[2, 3] = -2.0
    vertices = (rng.rand(100, 3) * 0.2 - 0.1).astype(np.float64)

    img = (rng.rand(256, 256, 3) * 200 + 40).astype(np.uint8)  # bright enough
    mask = np.zeros((256, 256, 3), np.uint8)
    mask[60:200, 70:210] = dr.COLOR_FACE

    for i, name in enumerate(["face_0", "face_1"]):
        np.savez(
            src / f"{name}.npz", modelview=modelview, projection=projection,
            vertices=vertices, resolution=np.asarray(256.0),
        )
        cv2.imwrite(str(src / f"{name}_img.jpg"),
                    img if i == 0 else np.zeros_like(img))  # face_1: too dark
        cv2.imwrite(str(src / f"{name}_mask.png"), mask)

    out = str(tmp_path / "repl.h5")
    monkeypatch.setattr(sys, "argv", ["dsprocess_replicantface.py", str(src), out])
    dr.main()

    with h5py.File(out, "r") as fh:
        assert fh["images"].shape[0] == 1  # dark render filtered out
        quat = fh["quats"][0]
        # Identity modelview (translation only) -> identity rotation.
        np.testing.assert_allclose(abs(quat[3]), 1.0, atol=1e-6)
        coords = fh["coords"][0]
        # Weak-perspective size: 0.1 m * f / depth * 256 * 0.5; the eye-center
        # offset (-0.086 z in headbone frame) brings depth to 2 - 0.086 m.
        np.testing.assert_allclose(coords[2], 0.1 * f / (2.0 - 0.086) * 256 * 0.5, rtol=0.02)
        assert fh["pt3d_68"].shape == (1, 68, 3)
