"""Asset tooling: GMM shape-prior fitting from dataset shape parameters.

(`scripts/fit_shapeparams_gmm.py`, replacing the reference's
FitShapeParamsDistribution notebook; the fitted artifact feeds
ShapePlausibilityLoss.)"""

import sys
from os.path import dirname, join, realpath

import numpy as np
import pytest

sys.path.insert(0, join(dirname(realpath(__file__)), "..", "scripts"))

from tests.test_pipelines import write_pose_h5


def test_fit_shapeparams_gmm_cli(tmp_path, monkeypatch):
    pytest.importorskip("sklearn")
    import h5py

    import fit_shapeparams_gmm

    src = str(tmp_path / "shapes.h5")
    write_pose_h5(src, 256, seed=17)
    out = str(tmp_path / "gmm.h5")
    monkeypatch.setattr(sys, "argv", [
        "fit_shapeparams_gmm.py", src, "--out", out, "--components", "2",
    ])
    fit_shapeparams_gmm.main()

    from neuralnet_tracker_traincode_tpu.models.components import GaussianMixture

    gmm = GaussianMixture.from_hdf5(out)
    assert gmm.n_components == 2
    assert gmm.means.shape == (2, 50)
    # Log-likelihood is finite and higher for in-distribution samples than
    # for far-out ones.
    with h5py.File(src, "r") as f:
        x = f["shapeparams"][:8].astype(np.float32)
    ll_in = np.asarray(gmm(x))
    ll_out = np.asarray(gmm(np.full((8, 50), 50.0, np.float32)))
    assert np.isfinite(ll_in).all()
    assert (ll_in > ll_out).all()
