"""End-to-end CLI smoke: train -> evaluate through the real script mains.

The reference's test suite never exercises its CLIs; SURVEY.md section 4 calls
this out as a gap the rebuild should close. Runs on the 8-virtual-device CPU
mesh with a tiny synthetic aflw2k dataset.
"""

import sys
from os.path import dirname, join, realpath

import numpy as np
import pytest

sys.path.insert(0, join(dirname(realpath(__file__)), "..", "scripts"))

from tests.test_pipelines import write_pose_h5


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_datadir")
    write_pose_h5(str(d / "aflw2k.h5"), 420)
    return d


def test_train_then_evaluate_cli(datadir, tmp_path, monkeypatch):
    monkeypatch.setenv("DATADIR", str(datadir))
    outdir = tmp_path / "run"

    import train_poseestimator

    monkeypatch.setattr(sys, "argv", [
        "train_poseestimator.py", "--ds", "aflw2k", "--epochs", "1",
        "--batchsize", "16", "--samples-per-epoch", "64",
        "--outdir", str(outdir), "--no-imgaug",
    ])
    train_poseestimator.main()

    ckpt = outdir / "NetworkWithPointHead_mobilenetv1" / "best.ckpt"
    assert ckpt.exists()
    assert (outdir / "NetworkWithPointHead_mobilenetv1" / "resume.msgpack").exists()

    import evaluate_pose_network

    json_out = str(tmp_path / "result.json")
    monkeypatch.setattr(sys, "argv", [
        "evaluate_pose_network.py", str(ckpt), "--ds", "aflw2k3d",
        "--device", "cpu", "--json", json_out,
    ])
    evaluate_pose_network.main()

    import json

    with open(json_out) as f:
        table = json.load(f)
    (model_rows,) = table.values()
    assert "Geodesic°" in model_rows
    assert np.isfinite(model_rows["Geodesic°"][0])
