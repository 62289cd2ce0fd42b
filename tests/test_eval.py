"""Eval stack: alignment algorithms, metrics, predictor round-trip.

Mirrors `test/test_eval.py` (opal alignment on synthetic clusters, perspective
corrector on analytic FOV cases) plus a predictor smoke test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from neuralnet_tracker_traincode_tpu.eval import alignment, metrics as M
from neuralnet_tracker_traincode_tpu.eval.predictor import CheckpointPoseNetwork, Predictor
from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead


def test_compute_mean_rotation(rng):
    base = Rotation.from_euler("XYZ", [0.3, -0.2, 0.1])
    perturb = Rotation.from_rotvec(rng.randn(64, 3) * 0.05)
    mean = alignment.compute_mean_rotation(base * perturb)
    err = (mean.inv() * base).magnitude()
    assert err < 0.03


def test_opal_alignment_removes_cluster_bias(rng):
    # Two individuals, each with a constant rotation offset in the predictions.
    target = Rotation.random(80, random_state=rng)
    ids = np.repeat([0, 1], 40)
    offsets = {0: Rotation.from_euler("y", 0.2), 1: Rotation.from_euler("x", -0.15)}
    pred = Rotation.concatenate([target[i] * offsets[ids[i]] for i in range(80)])
    aligned = alignment.compute_opal_paper_alignment(
        pred.as_quat().astype(np.float32), target.as_quat().astype(np.float32), ids
    )
    errs = (Rotation.from_quat(aligned).inv() * target).magnitude()
    assert np.mean(errs) < 0.01


def test_perspective_corrector_center_is_identity():
    pc = alignment.PerspectiveCorrector(fov=57.0)
    pose = Rotation.from_euler("XYZ", [0.1, 0.2, 0.3]).as_quat()[None].astype(np.float32)
    image_sizes = np.asarray([[640, 480]], np.float32)
    coord = np.asarray([[320.0, 240.0, 50.0]], np.float32)  # image center
    out = np.asarray(pc.corrected_rotation(image_sizes, coord, pose))
    sign = np.sign(np.sum(out * pose, axis=-1, keepdims=True))
    np.testing.assert_allclose(out * sign, pose, atol=1e-5)


def test_perspective_corrector_edge_rotates_by_half_fov():
    fov = 57.0
    pc = alignment.PerspectiveCorrector(fov=fov)
    pose = np.asarray([[0.0, 0, 0, 1]], np.float32)  # identity
    image_sizes = np.asarray([[640, 480]], np.float32)
    coord = np.asarray([[640.0, 240.0, 50.0]], np.float32)  # right edge
    out = np.asarray(pc.corrected_rotation(image_sizes, coord, pose))
    angle = Rotation.from_quat(out[0]).magnitude()
    np.testing.assert_allclose(angle, fov / 2 * np.pi / 180.0, atol=1e-3)


def test_euler_error_metric(rng):
    m = M.EulerAngleErrors()
    q = Rotation.random(8, random_state=rng).as_quat()
    m.update({"pose": q}, {"pose": q})
    errs = m.compute()
    assert errs.shape == (8, 3)
    np.testing.assert_allclose(errs, 0.0, atol=1e-6)


def test_kpt_nme_binning(rng):
    m = M.KptNME(dimensions=2)
    # Construct poses at yaw ~0, ~45, ~75 degrees in the AFLW convention
    from neuralnet_tracker_traincode_tpu import utils

    yaws = np.asarray([0.1, 45.0, 75.0]) * np.pi / 180.0
    rots = utils.aflw_rotation_conversion(np.zeros(3), yaws, np.zeros(3))
    pts_gt = rng.rand(3, 68, 3).astype(np.float32)
    pts_pred = pts_gt + 0.01
    m.update({"pt3d_68": pts_pred}, {"pose": rots.as_quat(), "pt3d_68": pts_gt})
    res = m.compute()
    assert np.isfinite([res.bin_30_nme, res.bin_60_nme, res.bin_90_nme, res.avg_nme]).all()


def test_normalized_xys_error():
    m = M.NormalizedXYSError()
    target = {"coord": np.asarray([[10.0, 10, 5]]), "roi": np.asarray([[0.0, 0, 100, 100]])}
    pred = {"coord": np.asarray([[15.0, 10, 6]])}
    m.update(pred, target)
    np.testing.assert_allclose(m.compute(), [[0.05, 0.0, 0.01]], atol=1e-6)


@pytest.fixture(scope="module")
def tiny_net():
    model = NetworkWithPointHead(enable_point_head=True, config="mobilenetv1")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 129, 129, 1)),
    )
    return CheckpointPoseNetwork(model, variables)


def test_predictor_roundtrip(tiny_net, rng):
    predictor = Predictor(tiny_net, focus_roi_expansion_factor=1.1)
    images = [(rng.rand(200, 180, 1) * 255).astype(np.uint8) for _ in range(3)]
    rois = np.asarray([[40.0, 40, 140, 140]] * 3, np.float32)
    preds = predictor.predict_batch(images, rois)
    assert preds["pose"].shape == (3, 4)
    assert preds["coord"].shape == (3, 3)
    assert preds["pt3d_68"].shape == (3, 68, 3)
    coord = np.asarray(preds["coord"])
    # Predictions near the identity-initialized network map into the crop
    # neighborhood -> after backtransform they land near the roi center.
    assert np.all(coord[:, 0] > 0) and np.all(coord[:, 0] < 200)
    # size must be positive in pixel units
    assert np.all(coord[:, 2] > 0)


@pytest.mark.slow
def test_predictor_evaluate_streams(tiny_net, rng):
    predictor = Predictor(tiny_net, focus_roi_expansion_factor=1.1)

    from neuralnet_tracker_traincode_tpu.data.batch import Batch, Metadata
    from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory

    def make_sample(i):
        meta = Metadata((64, 64), 0)
        meta.categories = {
            "image": FieldCategory.image,
            "roi": FieldCategory.roi,
            "pose": FieldCategory.quat,
            "coord": FieldCategory.xys,
        }
        return Batch(
            meta,
            {
                "image": (rng.rand(64, 64, 1) * 255).astype(np.uint8),
                "roi": np.asarray([10.0, 10, 50, 50], np.float32),
                "pose": np.asarray([0.0, 0, 0, 1], np.float32),
                "coord": np.asarray([30.0, 30, 20], np.float32),
            },
        )

    loader = [make_sample(i) for i in range(5)]
    metric = M.MetricCollection(
        {"geo": M.GeodesicError(), "xys": M.NormalizedXYSError()}
    )
    out = predictor.evaluate(metric, loader, chunksize=2)
    assert out["geo"].shape == (5,)
    assert out["xys"].shape == (5, 3)
