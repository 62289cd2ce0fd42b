"""Loss and NLL correctness (mirrors `test/test_negloglikelihood.py` + loss behavior)."""

from os.path import dirname, join

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation
from scipy.stats import multivariate_normal, norm

from neuralnet_tracker_traincode_tpu.losses import losses as L
from neuralnet_tracker_traincode_tpu.losses import nll as NLL
from neuralnet_tracker_traincode_tpu.losses.criterion import (
    Criterion,
    CriterionGroup,
    LossVal,
    MaskedMultiTaskCriterion,
    concatenated_lossvals_by_name,
)
from neuralnet_tracker_traincode_tpu.ops.rotrepr import QuatRepr

GMM_PATH = join(
    dirname(__file__), "..", "neuralnet_tracker_traincode_tpu", "facemodel", "assets",
    "shapeparams_gmm.h5",
)


def test_quat_pose_loss_zero_on_match(rng):
    q = jnp.asarray(Rotation.random(4, random_state=rng).as_quat(), jnp.float32)
    loss = L.QuatPoseLoss("approx_distance")
    out = np.asarray(loss({"rot": QuatRepr(q)}, {"pose": q}))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_smooth_geodesic(rng):
    a = Rotation.random(8, random_state=rng)
    b = Rotation.random(8, random_state=rng)
    out = np.asarray(
        L.smooth_geodesic_distance(jnp.asarray(a.as_quat()), jnp.asarray(b.as_quat()))
    )
    angle = (a.inv() * b).magnitude()
    beta = np.pi / 180.0
    expected = np.where(angle < beta, 0.5 * angle**2 / beta, angle - 0.5 * beta) / np.pi
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_points3d_loss_weighting(rng):
    pred = jnp.zeros((2, 68, 3))
    target = jnp.ones((2, 68, 3))
    loss = L.Points3dLoss("l2", chin_weight=0.8, eye_weights=0.0)
    out = np.asarray(loss({"pt3d_68": pred}, {"pt3d_68": target}))
    # 16 chin points at 0.8, 8 eye points at 0, 44 at 1.0; l2 error 3 per point
    expected = 3.0 * (16 * 0.8 + 44 * 1.0) / 68.0
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_gaussian_laplace_log_prob(rng):
    x = rng.randn(16).astype(np.float32)
    loc = rng.randn(16).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, 16).astype(np.float32)
    got = np.asarray(NLL.gaussian_log_prob(jnp.asarray(x), jnp.asarray(loc), jnp.asarray(scale)))
    expected = norm.logpdf(x, loc, scale)
    np.testing.assert_allclose(got, expected, atol=1e-4)
    got_l = np.asarray(NLL.laplace_log_prob(jnp.asarray(x), jnp.asarray(loc), jnp.asarray(scale)))
    from scipy.stats import laplace

    np.testing.assert_allclose(got_l, laplace.logpdf(x, loc, scale), atol=1e-4)


def test_mvn_log_prob(rng):
    D = 3
    A = rng.randn(D, D)
    cov = A @ A.T + np.eye(D)
    tril = np.linalg.cholesky(cov)
    x = rng.randn(5, D)
    loc = rng.randn(5, D)
    got = np.asarray(
        NLL.mvn_log_prob_scale_tril(
            jnp.asarray(x), jnp.asarray(loc), jnp.broadcast_to(jnp.asarray(tril), (5, D, D))
        )
    )
    expected = [multivariate_normal.logpdf(x[i], loc[i], cov) for i in range(5)]
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_quat_pose_nll_prefers_match(rng):
    q = jnp.asarray(Rotation.random(8, random_state=rng).as_quat(), jnp.float32)
    other = jnp.asarray(Rotation.random(8, random_state=rng).as_quat(), jnp.float32)
    tril = jnp.broadcast_to(0.1 * jnp.eye(3), (8, 3, 3))
    loss = NLL.QuatPoseNLLLoss()
    match = np.asarray(loss({"rot": QuatRepr(q), "pose_scales_tril": tril}, {"pose": q}))
    mismatch = np.asarray(loss({"rot": QuatRepr(q), "pose_scales_tril": tril}, {"pose": other}))
    assert np.all(match < mismatch)


def test_mix_with_uniform_bounds():
    mix = NLL.MixWithUniformProbability(4.0)
    # Catastrophically low log prob is floored near log(0.001 / 4)
    out = float(mix(jnp.asarray([-1e6]))[0])
    assert abs(out - np.log(0.001 / 4.0)) < 1e-3


def test_shape_plausibility_loss(rng):
    import h5py

    loss = L.ShapePlausibilityLoss.from_hdf5(GMM_PATH)
    with h5py.File("/root/reference/aflw2kmini.h5", "r") as f:
        params = f["shapeparams"][...]
    typical = np.asarray(loss({"shapeparam": jnp.asarray(params)}, {}))
    outlier = np.asarray(loss({"shapeparam": jnp.asarray(params + 100.0)}, {}))
    assert np.all(outlier > typical)


def test_criterion_group_weights():
    c1 = Criterion("a", lambda p, b: jnp.ones((4,)), 2.0)
    c2 = Criterion("b", lambda p, b: jnp.ones((4,)), lambda step: 0.5 * step)
    group = CriterionGroup([c1, c2], name="g", w=3.0)
    vals = group.evaluate({}, {}, step=2)
    assert [v.name for v in vals] == ["ga", "gb"]
    assert vals[0].weight == 6.0
    assert vals[1].weight == 3.0


def test_concatenated_lossvals():
    vals = [
        LossVal(jnp.ones((2,)), 1.0, "a"),
        LossVal(jnp.zeros((3,)), 2.0, "a"),
        LossVal(jnp.ones((2,)), 0.5, "b"),
    ]
    byname = concatenated_lossvals_by_name(vals)
    assert byname["a"][0].shape == (5,)
    np.testing.assert_allclose(np.asarray(byname["a"][1]), [1, 1, 2, 2, 2])


def test_masked_multitask_criterion_matches_subbatch_semantics():
    # Two tags with overlapping loss terms; masking must reproduce the
    # reference's sliced sub-batch computation.
    f_rot = lambda p, b: jnp.abs(p["x"][:, 0] - b["y"][:, 0])
    f_pts = lambda p, b: jnp.abs(p["x"][:, 1] - b["y"][:, 1])
    rot = Criterion("rot", f_rot, 1.0)
    pts = Criterion("pts", f_pts, 0.5)
    crit_by_tag = {
        "POSE": CriterionGroup([rot]),
        "BOTH": CriterionGroup([rot, pts]),
    }
    mc = MaskedMultiTaskCriterion(crit_by_tag, ["POSE", "BOTH"])
    assert mc.num_terms == 2
    W = mc.weight_matrix(0)
    np.testing.assert_allclose(W, [[1.0, 0.0], [1.0, 0.5]])

    preds = {"x": jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])}
    batch = {"y": jnp.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])}
    tag_id = jnp.asarray([0, 1, 1])
    loss, byname = mc(preds, batch, tag_id, jnp.asarray(W))
    # manual: rot: |1-0| + |3-1| + |5-2| = 6 (all samples); pts for samples 1,2:
    # 0.5*(|4-1| + |6-2|) = 3.5 -> (6 + 3.5) / 3
    np.testing.assert_allclose(float(loss), (6.0 + 3.5) / 3.0, atol=1e-6)
    assert set(byname.keys()) == {"rot", "pts"}


def test_masked_criterion_step_dependent_weights():
    ramp = lambda step: min(1.0, step / 10.0)
    c = Criterion("nll", lambda p, b: jnp.ones((2,)), ramp)
    mc = MaskedMultiTaskCriterion({"T": CriterionGroup([c])}, ["T"])
    assert mc.weight_matrix(0)[0, 0] == 0.0
    assert mc.weight_matrix(5)[0, 0] == 0.5
    assert mc.weight_matrix(100)[0, 0] == 1.0


def test_masked_criterion_dataset_weight():
    c = Criterion("a", lambda p, b: jnp.ones((3,)), 1.0)
    mc = MaskedMultiTaskCriterion({"T": CriterionGroup([c])}, ["T"])
    W = jnp.asarray(mc.weight_matrix(0))
    tag_id = jnp.zeros((3,), jnp.int32)
    dsw = jnp.asarray([1.0, 0.5, 0.0])
    loss, _ = mc({}, {}, tag_id, W, dataset_weight=dsw)
    np.testing.assert_allclose(float(loss), 1.5 / 3.0, atol=1e-6)
