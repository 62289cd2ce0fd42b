"""HDF5 storage wrapper round-trips (mirrors `test/test_dshdf5.py`)."""

import h5py
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.data import hdf5 as dshdf5
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory
from neuralnet_tracker_traincode_tpu.data.pose_dataset import (
    Hdf5PoseDataset,
    Hdf5PoseVideoDataset,
    create_pose_dataset,
)


@pytest.fixture
def h5file(tmp_path):
    path = tmp_path / "test.h5"
    with h5py.File(path, "w") as f:
        yield f


def test_image_varsize_buffer_jpg_roundtrip(h5file, rng):
    ds = dshdf5.ImageVariableLengthBufferDs.create(h5file, "images", 2, lossy=True)
    img = (rng.rand(32, 32) * 255).astype(np.uint8)
    ds[0] = img
    out = ds[0]
    assert out.shape == (32, 32)
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 20  # lossy


def test_image_varsize_buffer_png_lossless(h5file, rng):
    ds = dshdf5.ImageVariableLengthBufferDs.create(h5file, "images", 1, lossy=False)
    img = (rng.rand(16, 16) * 255).astype(np.uint8)
    ds[0] = img
    np.testing.assert_array_equal(ds[0], img)


def test_image_buffer_format_mismatch_raises(h5file, rng):
    from neuralnet_tracker_traincode_tpu.data.preprocessing import ImageFormat, imencode

    ds = dshdf5.ImageVariableLengthBufferDs.create(h5file, "images", 1, lossy=True)
    png_buffer = imencode((rng.rand(8, 8) * 255).astype(np.uint8), format=ImageFormat.PNG)
    with pytest.raises(ValueError):
        ds[0] = png_buffer


def test_quantized_varsize_array(h5file, rng):
    ds = dshdf5.QuantizedVarsizeArrayDs.create(h5file, "arr", 2, sample_dimensionality=2)
    value = rng.rand(7, 3).astype(np.float32) * 10.0
    ds[0] = value
    out = ds[0]
    assert out.shape == (7, 3)
    assert np.abs(out - value).max() < (value.max() - value.min() + 1) / 256 + 1e-6


def test_open_dataset_dispatch(h5file, rng):
    dshdf5.ImageVariableLengthBufferDs.create(h5file, "images", 1)
    dshdf5.QuantizedVarsizeArrayDs.create(h5file, "quant", 1, 1)
    h5file.create_dataset("plain", data=np.arange(5))
    assert isinstance(dshdf5.open_dataset(h5file, "images"), dshdf5.ImageVariableLengthBufferDs)
    assert isinstance(dshdf5.open_dataset(h5file, "quant"), dshdf5.QuantizedVarsizeArrayDs)
    assert isinstance(dshdf5.open_dataset(h5file, "plain"), h5py.Dataset)


def _write_pose_file(path, n=6, sequence_starts=None, rng=None):
    rng = rng or np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        ds = create_pose_dataset(f, FieldCategory.image, count=n)
        for i in range(n):
            ds[i] = (rng.rand(24, 24) * 255).astype(np.uint8)
        create_pose_dataset(
            f, FieldCategory.quat, count=n, dtype=np.float16,
            data=np.tile([0.0, 0, 0, 1], (n, 1)).astype(np.float16),
        )
        create_pose_dataset(
            f, FieldCategory.xys, count=n, dtype=np.float32, data=rng.rand(n, 3).astype(np.float32)
        )
        create_pose_dataset(
            f, FieldCategory.roi, count=n, dtype=np.float32, data=rng.rand(n, 4).astype(np.float32)
        )
        create_pose_dataset(
            f, FieldCategory.points, name="pt3d_68", count=n, shape_wo_batch_dim=(68, 3),
            dtype=np.float32, data=rng.rand(n, 68, 3).astype(np.float32),
        )
        if sequence_starts is not None:
            f.create_dataset("sequence_starts", data=np.asarray(sequence_starts, np.int32))


def test_pose_dataset(tmp_path, rng):
    path = str(tmp_path / "pose.h5")
    _write_pose_file(path, n=6, rng=rng)
    ds = Hdf5PoseDataset(path, dataclass="T", coord_convention_id=2)
    assert len(ds) == 6
    sample = ds[0]
    # Name normalization & dtype normalization
    assert sample["pose"].dtype == np.float32
    assert sample["image"].shape == (24, 24, 1)
    assert sample.meta.image_wh == (24, 24)
    assert sample.get_category("pose") == FieldCategory.quat
    assert sample.get_category("pt3d_68") == FieldCategory.points
    assert sample["index"] == 0
    assert sample["coord_convention_id"] == 2
    with pytest.raises(IndexError):
        ds[6]


def test_pose_dataset_individual(tmp_path, rng):
    path = str(tmp_path / "pose_seq.h5")
    _write_pose_file(path, n=6, sequence_starts=[0, 2, 6], rng=rng)
    ds = Hdf5PoseDataset(path)
    assert ds[1]["individual"] == 0
    assert ds[3]["individual"] == 1


def test_pose_dataset_transform_called(tmp_path, rng):
    path = str(tmp_path / "pose_t.h5")
    _write_pose_file(path, n=2, rng=rng)
    calls = []

    def spy(sample):
        calls.append(sample)
        return sample

    ds = Hdf5PoseDataset(path, transform=spy)
    ds[0]
    assert len(calls) == 1


def test_video_pose_dataset(tmp_path, rng):
    path = str(tmp_path / "video.h5")
    _write_pose_file(path, n=10, sequence_starts=[0, 1, 5, 10], rng=rng)
    ds = Hdf5PoseVideoDataset(path, min_sequence_size=2, max_sequence_size=3)
    # Sequence [0,1) dropped (too short); [1,5) length 4 split into 2; [5,10) length 5 split into 2
    assert len(ds) == 4
    sample = ds[0]
    assert sample.meta.seq is not None
    assert sample.meta.seq[-1] <= 3
    assert sample["image"].ndim == 4


def test_video_postprocess_sequence():
    # Short -> dropped; in-range -> kept; long -> overlapping splits
    f = Hdf5PoseVideoDataset._postprocess_sequence
    assert f(0, 1, 2, 4) == []
    assert f(0, 3, 2, 4) == [(0, 3)]
    out = f(0, 10, 2, 4)
    assert all(e - s == 4 for s, e in out)
    assert out[0][0] == 0 and out[-1][1] == 10
