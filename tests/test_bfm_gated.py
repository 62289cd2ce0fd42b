"""Tests for the $BFM_PATH-gated full-mesh paths.

The real `bfm_noneck_v3.pkl` is a non-distributable blob (git-LFS-missing in
the reference too, `.MISSING_LARGE_BLOBS:2`), so these tests build a synthetic
pickle with the same layout (flattened `u`, per-coordinate eigvec matrices,
flattened keypoint index triplets) and exercise every gated code path with it:
`FullBFMModel` (ref. `trackertraincode/facemodel/bfm.py:23-78`), the
`convert_bfm.py` artifact export, `_load_subset_arrays` env resolution, the
forehead ROI mode of `PutRoiFromLandmarks` (ref.
`datatransformation/batch/misc.py:9-31`), the panoptic bbox vertex cloud, the
vis3d gating, and the closed-eyes converter wrapper (external package stubbed).
"""

import contextlib
import pickle
import subprocess
import sys
import types
from os.path import dirname, join, realpath

import numpy as np
import pytest

sys.path.insert(0, join(dirname(realpath(__file__)), "..", "scripts"))

from neuralnet_tracker_traincode_tpu.data.batch import Batch, Metadata
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory
from neuralnet_tracker_traincode_tpu.facemodel import bfm

NUM_VERTS = 15000  # must exceed the largest remapped eye index (14327)


@pytest.fixture(scope="module")
def bfm_pkl(tmp_path_factory):
    """Synthetic pickle in the 3DDFA `bfm_noneck_v3.pkl` layout."""
    rnd = np.random.RandomState(20260817)
    vidx = np.sort(rnd.choice(NUM_VERTS, size=68, replace=False)).astype(np.int64)
    blob = {
        # Flattened xyz mean shape; the loader rescales by 1e-5.
        "u": (rnd.uniform(-1.0, 1.0, size=(3 * NUM_VERTS, 1)) * 1.0e5).astype(
            np.float32
        ),
        # Loader slices the first 40/10 columns; ship a few extra like the real blob.
        "w_shp": rnd.normal(size=(3 * NUM_VERTS, 45)).astype(np.float32) * 1e-3,
        "w_exp": rnd.normal(size=(3 * NUM_VERTS, 12)).astype(np.float32) * 1e2,
        # Keypoints stored as flattened coordinate indices (3i, 3i+1, 3i+2).
        "keypoints": np.stack([3 * vidx, 3 * vidx + 1, 3 * vidx + 2], axis=1)
        .ravel()
        .astype(np.float64),
    }
    path = tmp_path_factory.mktemp("bfm") / "bfm_noneck_v3.pkl"
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    return str(path)


def test_full_bfm_model_load(bfm_pkl):
    full = bfm.FullBFMModel(bfm_pkl)
    assert full.vertexcount == NUM_VERTS
    assert full.w_shp.shape == (3 * NUM_VERTS, 40)
    assert full.w_exp.shape == (3 * NUM_VERTS, 10)
    assert full.keypoints.shape == (68,)
    # Eye keypoints are remapped to the closed-eye-consistent vertex rows.
    assert full.keypoints[36] == bfm.LEFT_EYE_NEW[0]
    assert full.keypoints[46] == bfm.RIGHT_EYE_NEW[5]
    verts = full.scaled_vertices
    assert verts.shape == (NUM_VERTS, 3)
    # Head-radius units after the 1e-5 rescale + recentering.
    assert np.abs(verts).max() < 3.0
    bases = full.scaled_bases
    assert bases.shape == (50, NUM_VERTS, 3)
    # y/z flip applied to both mean shape and bases.
    raw = full.u.reshape(-1, 3) * 1e-5
    np.testing.assert_allclose(verts[:, 1], -raw[:, 1] - bfm.ACTUAL_CENTER[1], atol=1e-5)
    with pytest.raises(AssertionError):
        _ = full.scaled_tri  # no tri.pkl shipped


def test_subset_export_and_artifact_roundtrip(bfm_pkl, tmp_path):
    full = bfm.FullBFMModel(bfm_pkl)
    out = full.export_keypoint_subset(str(tmp_path / "subset.npz"))
    with np.load(out) as f:
        np.testing.assert_array_equal(
            f["keypts"], full.scaled_vertices[full.keypoints]
        )
        assert f["w_shp"].shape == (40, 68, 3)
        assert f["w_exp"].shape == (10, 68, 3)
        assert str(f["source"]) == "bfm_noneck_v3.pkl"


@contextlib.contextmanager
def _fresh_subset_cache():
    bfm._load_subset_arrays.cache_clear()
    try:
        yield
    finally:
        bfm._load_subset_arrays.cache_clear()


def test_bfm_path_env_resolution(bfm_pkl, monkeypatch, tmp_path):
    """With no artifact on disk, $BFM_PATH drives the on-the-fly conversion."""
    monkeypatch.setattr(bfm, "SUBSET_ARTIFACT", str(tmp_path / "missing.npz"))
    monkeypatch.setenv("BFM_PATH", bfm_pkl)
    with _fresh_subset_cache():
        model = bfm.BFMModel()
        assert model.is_authentic
        assert model.keypts.shape == (68, 3)
        assert model.scaled_bases.shape == (50, 68, 3)
        full = bfm.FullBFMModel(bfm_pkl)
        np.testing.assert_array_equal(model.keypts, full.scaled_vertices[full.keypoints])


def test_bfm_missing_everything_raises(monkeypatch, tmp_path):
    monkeypatch.setattr(bfm, "SUBSET_ARTIFACT", str(tmp_path / "missing.npz"))
    monkeypatch.delenv("BFM_PATH", raising=False)
    with _fresh_subset_cache():
        with pytest.raises(FileNotFoundError):
            bfm.BFMModel()


def test_convert_bfm_cli(bfm_pkl, tmp_path):
    out = tmp_path / "subset.npz"
    script = join(dirname(realpath(__file__)), "..", "scripts", "convert_bfm.py")
    subprocess.run(
        [sys.executable, script, bfm_pkl, "--out", str(out)],
        check=True,
        timeout=120,
    )
    with np.load(out) as f:
        assert f["keypts"].shape == (68, 3)
        assert str(f["source"]) == "bfm_noneck_v3.pkl"


def _pose_sample():
    rnd = np.random.RandomState(7)
    meta = Metadata((129, 129), 0)
    meta.categories = {
        "pt3d_68": FieldCategory.points,
        "coord": FieldCategory.xys,
        "pose": FieldCategory.quat,
    }
    return Batch(
        meta,
        {
            "pt3d_68": (rnd.uniform(40, 90, size=(68, 3))).astype(np.float32),
            "coord": np.asarray([64.0, 64.0, 30.0], np.float32),
            "pose": np.asarray([0.1, 0.0, 0.0, 1.0], np.float32) / np.sqrt(1.01),
            "shapeparam": rnd.normal(size=(50,)).astype(np.float32) * 0.1,
        },
    )


def test_put_roi_forehead_full_mesh(bfm_pkl, monkeypatch):
    from neuralnet_tracker_traincode_tpu.data.host_transforms import PutRoiFromLandmarks

    monkeypatch.setenv("BFM_PATH", bfm_pkl)
    tf = PutRoiFromLandmarks(extend_to_forehead=True)
    assert tf._full_model is not None
    out = tf(_pose_sample())
    roi = out["roi"]
    assert roi.shape == (4,) and roi.dtype == np.float32
    assert roi[0] < roi[2] and roi[1] < roi[3]
    assert out.get_category("roi") == FieldCategory.roi
    # Full-mesh AABB must cover at least the head sphere footprint scale-wise:
    # vertices span ~±1 head radius around the center after posing.
    assert roi[2] - roi[0] > 20.0

    # And differ from the sphere-approximation fallback result in general.
    monkeypatch.delenv("BFM_PATH")
    tf_fallback = PutRoiFromLandmarks(extend_to_forehead=True)
    assert tf_fallback._full_model is None
    roi_fb = tf_fallback(_pose_sample())["roi"]
    assert roi_fb.shape == (4,)


def test_panoptic_face_vertices_with_full_bfm(bfm_pkl, monkeypatch):
    """Regression: `_face_vertices` used to call FullBFMModel() without a path."""
    import dsprocess_panoptic

    monkeypatch.setenv("BFM_PATH", bfm_pkl)
    verts = dsprocess_panoptic._face_vertices()
    assert verts.shape == (5000, 3)
    assert np.isfinite(verts).all()


def test_vis3d_gating(bfm_pkl, monkeypatch):
    from neuralnet_tracker_traincode_tpu import vis3d

    monkeypatch.delenv("BFM_PATH", raising=False)
    with pytest.raises(RuntimeError, match="BFM_PATH"):
        vis3d._require_full_mesh()
    monkeypatch.setenv("BFM_PATH", bfm_pkl)
    model = vis3d._require_full_mesh()
    assert model.vertexcount == NUM_VERTS
    # the software rasterizer backend needs no pyrender; construction works
    # with just the blob, but rendering needs the mesh triangulation
    # (assets/tri.pkl, a separate non-distributable artifact).
    from scipy.spatial.transform import Rotation

    render = vis3d.FaceRender()
    with pytest.raises(AssertionError, match="tri.pkl"):
        render.set((0.0, 0.0), 1.0, Rotation.identity(), np.zeros(50), (32, 32))
    if "pyrender" not in sys.modules:
        with pytest.raises(ModuleNotFoundError):
            vis3d.FaceRender(backend="pyrender")


def test_closed_eyes_converter_with_stubbed_package(monkeypatch, tmp_path):
    import create_aflw2k3d_closed_eyes as script

    written = []
    passthrough_calls = []

    class FakeDataset:
        def __init__(self, fn):
            self.samples = [
                {"name": "a", "scale": 1.0},
                {"name": "b", "scale": -1.0},  # invalid-size passthrough branch
                {"name": "c", "scale": 2.0},
            ]

        def __len__(self):
            return len(self.samples)

        def __iter__(self):
            return iter(self.samples)

        def close(self):
            pass

    class FakeWriter:
        def write(self, name, generated):
            written.append((name, generated))

    @contextlib.contextmanager
    def fake_dataset_writer(fn):
        yield FakeWriter()

    def fake_augment(prob, rng, sample):
        assert isinstance(rng, np.random.RandomState)
        return {"aug": sample["name"], "prob": prob}

    def fake_passthrough(sample):
        passthrough_calls.append(sample["name"])
        return {"pass": sample["name"]}

    pkg = types.ModuleType("face3drotationaugmentation")
    ds_mod = types.ModuleType("face3drotationaugmentation.dataset300wlp")
    ds_mod.DatasetAFLW2k3D = FakeDataset
    wr_mod = types.ModuleType("face3drotationaugmentation.datasetwriter")
    wr_mod.dataset_writer = fake_dataset_writer
    gen_mod = types.ModuleType("face3drotationaugmentation.generate")
    gen_mod.augment_eyes_only = fake_augment
    gen_mod.make_sample_for_passthrough = fake_passthrough
    pkg.dataset300wlp = ds_mod
    pkg.datasetwriter = wr_mod
    pkg.generate = gen_mod
    for name, mod in [
        ("face3drotationaugmentation", pkg),
        ("face3drotationaugmentation.dataset300wlp", ds_mod),
        ("face3drotationaugmentation.datasetwriter", wr_mod),
        ("face3drotationaugmentation.generate", gen_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    script.main("in.zip", str(tmp_path / "out.h5"), 2, prob_closed_eyes=0.5)
    # max_num_frames=2 truncates to the first two samples; sample "b" has an
    # invalid head size and must go through the passthrough branch.
    assert [n for n, _ in written] == ["a", "b"]
    assert written[0][1] == {"aug": "a", "prob": 0.5}
    assert passthrough_calls == ["b"]


def test_closed_eyes_converter_missing_package(monkeypatch):
    import create_aflw2k3d_closed_eyes as script

    for name in list(sys.modules):
        if name.startswith("face3drotationaugmentation"):
            monkeypatch.delitem(sys.modules, name)
    with pytest.raises(SystemExit, match="face3drotationaugmentation"):
        script.main("in.zip", "out.h5", 1, 0.0)


@pytest.fixture
def fitted_pose_h5(tmp_path):
    """Synthetic fitted dataset in the layout create_largepose_dataset.py
    consumes: images/rois + a 2dfit_v3 group (as written by fit_face_model.py)
    + the MTCNN has_one_face field."""
    import h5py

    from neuralnet_tracker_traincode_tpu.data.pose_dataset import create_pose_dataset

    n = 5
    rnd = np.random.RandomState(7)
    path = str(tmp_path / "fitted.h5")
    quats = rnd.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    coords = (rnd.rand(n, 3).astype(np.float32) * 100) + 50
    with h5py.File(path, "w") as f:
        images = create_pose_dataset(f, FieldCategory.image, count=n)
        for i in range(n):
            images[i] = np.full((16, 16), i * 10, np.uint8)
        # roi diagonals: index 1 is below the 196 px default threshold.
        rois = np.asarray(
            [[0, 0, 300, 10], [0, 0, 100, 10], [0, 0, 300, 10],
             [0, 0, 300, 10], [0, 0, 300, 10]], np.float32)
        create_pose_dataset(f, FieldCategory.roi, count=n, dtype=np.float32, data=rois)
        # index 3 fails the single-face filter.
        f.create_dataset("has_one_face", data=np.asarray([1, 1, 1, 0, 1], "?"))
        g = f.create_group("2dfit_v3")
        create_pose_dataset(g, FieldCategory.quat, data=quats)
        create_pose_dataset(g, FieldCategory.xys, data=coords)
        create_pose_dataset(g, FieldCategory.points, name="pt3d_68",
                            data=rnd.rand(n, 68, 3).astype(np.float32) * 200)
        create_pose_dataset(g, FieldCategory.general, name="shapeparams",
                            dtype=np.float16, data=rnd.randn(n, 50).astype(np.float16))
    return path, quats, coords


def _stub_rotaug_package(monkeypatch, written, augment_calls, fans_per_sample=2):
    pkg = types.ModuleType("face3drotationaugmentation")

    class FakeWriter:
        jpgquality = None

        def write(self, name, generated):
            written.append((name, generated))

    @contextlib.contextmanager
    def fake_dataset_writer(fn):
        yield FakeWriter()

    def fake_augment_sample(*, rng, angle_step, prob_closed_eyes, prob_spotlight, sample):
        assert isinstance(rng, np.random.RandomState)
        augment_calls.append(
            dict(sample, angle_step=angle_step, prob_closed_eyes=prob_closed_eyes,
                 prob_spotlight=prob_spotlight))
        for k in range(fans_per_sample):
            yield {"fan": k}

    pkg.dataset_writer = fake_dataset_writer
    pkg.augment_sample = fake_augment_sample
    monkeypatch.setitem(sys.modules, "face3drotationaugmentation", pkg)


def test_create_largepose_dataset_with_stubbed_package(monkeypatch, tmp_path, fitted_pose_h5):
    """End-to-end over the synthetic fit: frame selection (diameter +
    has_one_face + curated bad file), fit-group promotion, and the rotaug
    sample convention handed to the external package."""
    from scipy.spatial.transform import Rotation

    import create_largepose_dataset as script

    path, quats, coords = fitted_pose_h5
    written, augment_calls = [], []
    _stub_rotaug_package(monkeypatch, written, augment_calls)

    bad_file = tmp_path / "bad.json"
    bad_file.write_text("[4]")
    out = str(tmp_path / "aug.h5")
    script.main([path, out, "--bad-frames", str(bad_file), "--angle-step", "7.5"])

    # Survivors: index 1 too small, index 3 multi-face, index 4 curated away.
    assert [n for n, _ in written] == ["sample00"] * 2 + ["sample01"] * 2
    assert [c["angle_step"] for c in augment_calls] == [7.5, 7.5]
    for call, src in zip(augment_calls, (0, 2)):
        assert isinstance(call["rot"], Rotation)
        # Rotation.from_quat normalizes but must preserve the rotation.
        np.testing.assert_allclose(
            np.abs(np.dot(call["rot"].as_quat(), quats[src])), 1.0, atol=1e-6)
        np.testing.assert_allclose(call["xy"], coords[src, :2], atol=1e-5)
        np.testing.assert_allclose(call["scale"], coords[src, 2], atol=1e-5)
        assert call["image"].shape in ((16, 16), (16, 16, 3))
        # constant-valued JPEG round-trips near-exactly
        np.testing.assert_allclose(call["image"].reshape(-1).astype(float), src * 10, atol=2)
        assert call["pt3d_68"].shape == (68, 3)
        assert call["shapeparam"].shape == (50,)
        assert call["roi"].shape == (4,)
    # The temporary promoted/filtered files are cleaned up.
    assert sorted(p.name for p in tmp_path.iterdir()) == ["bad.json", "fitted.h5"]


def test_create_largepose_dataset_good_frames_override(monkeypatch, tmp_path, fitted_pose_h5):
    import create_largepose_dataset as script

    path, _, _ = fitted_pose_h5
    written, augment_calls = [], []
    _stub_rotaug_package(monkeypatch, written, augment_calls, fans_per_sample=1)
    good_file = tmp_path / "good.txt"
    good_file.write_text("1, 3")  # overrides diameter/has_one_face selection
    out = str(tmp_path / "aug.h5")
    script.main([path, out, "--good-frames", str(good_file), "-n", "1"])
    assert [n for n, _ in written] == ["sample00"]  # -n truncation
    np.testing.assert_allclose(  # frame index 1
        augment_calls[0]["image"].reshape(-1).astype(float), 10, atol=2)


def test_create_largepose_dataset_missing_package(monkeypatch, tmp_path, fitted_pose_h5):
    import create_largepose_dataset as script

    path, _, _ = fitted_pose_h5
    for name in list(sys.modules):
        if name.startswith("face3drotationaugmentation"):
            monkeypatch.delitem(sys.modules, name)
    with pytest.raises(SystemExit, match="face3drotationaugmentation"):
        script.main([path, str(tmp_path / "aug.h5")])


def test_create_largepose_dataset_empty_selection(monkeypatch, tmp_path, fitted_pose_h5):
    import create_largepose_dataset as script

    path, _, _ = fitted_pose_h5
    with pytest.raises(SystemExit, match="empty"):
        script.main([path, str(tmp_path / "aug.h5"), "--min-diameter", "1e9"])
