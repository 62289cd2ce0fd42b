"""dsjoin / filter_dataset utilities: concatenation with sequence_starts
re-offsetting, frame/sequence filtering. (Reference `scripts/dsjoin.py`,
`scripts/filter_dataset.py` — its test suite never covered them.)"""

import sys
from os.path import dirname, join, realpath

import h5py
import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), "..", "scripts"))

import dsjoin
import filter_dataset

from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory as C
from neuralnet_tracker_traincode_tpu.data.pose_dataset import create_pose_dataset


def _write(path, n, seq_starts=None, seed=0):
    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        ds = create_pose_dataset(f, C.image, count=n)
        for i in range(n):
            ds[i] = (rng.rand(16, 16) * 255).astype(np.uint8)
        q = rng.randn(n, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        create_pose_dataset(f, C.quat, count=n, dtype=np.float32, data=q)
        if seq_starts is not None:
            f.create_dataset("sequence_starts", data=np.asarray(seq_starts, np.int64))
    return q


def test_dsjoin_concatenates_and_reoffsets(tmp_path):
    a, b = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    out = str(tmp_path / "joined.h5")
    qa = _write(a, 6, seq_starts=[0, 2, 6], seed=1)
    qb = _write(b, 4, seq_starts=[0, 3, 4], seed=2)

    with h5py.File(a, "r") as fa, h5py.File(b, "r") as fb, h5py.File(out, "w") as fo:
        dsjoin.dsjoin([fa, fb], fo)

    with h5py.File(out, "r") as f:
        assert f["images"].shape[0] == 10
        np.testing.assert_allclose(f["quats"][...], np.concatenate([qa, qb]), atol=1e-6)
        np.testing.assert_array_equal(f["sequence_starts"][...], [0, 2, 6, 9, 10])
        assert f["quats"].attrs["category"] == C.quat.value


def test_filter_by_sequences(tmp_path):
    src, dst = str(tmp_path / "src.h5"), str(tmp_path / "dst.h5")
    q = _write(src, 6, seq_starts=[0, 2, 3, 6], seed=3)
    with h5py.File(src, "r") as f, h5py.File(dst, "w") as fo:
        filter_dataset.filter_file_by_sequences(f, fo, bad_sequence_indices=[1])
    with h5py.File(dst, "r") as f:
        assert f["images"].shape[0] == 5
        np.testing.assert_array_equal(f["sequence_starts"][...], [0, 2, 5])
        np.testing.assert_allclose(f["quats"][...], q[[0, 1, 3, 4, 5]], atol=1e-6)


def test_filter_by_frames(tmp_path):
    src, dst = str(tmp_path / "src.h5"), str(tmp_path / "dst.h5")
    q = _write(src, 5, seed=4)
    with h5py.File(src, "r") as f, h5py.File(dst, "w") as fo:
        filter_dataset.filter_file_by_frames(f, fo, bad_frame_indices=[0, 3])
    with h5py.File(dst, "r") as f:
        assert f["images"].shape[0] == 3
        np.testing.assert_allclose(f["quats"][...], q[[1, 2, 4]], atol=1e-6)
