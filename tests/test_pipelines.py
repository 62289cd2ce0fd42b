"""Pipeline integration: dataset registry + fused loader over synthetic HDF5.

Mirrors `test/test_pipelines.py` but with self-contained synthetic files
(the reference's version needs $DATADIR with real datasets).
"""

import os

import h5py
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.data.fields import DatasetId as Id, FieldCategory, Tag
from neuralnet_tracker_traincode_tpu.data.loader import FusedBatchLoader, pack_fused_batch
from neuralnet_tracker_traincode_tpu.data.pose_dataset import Hdf5PoseDataset, create_pose_dataset
from neuralnet_tracker_traincode_tpu.data.sampling import (
    ConcatDataset,
    make_concat_dataset_item_sampler,
)


def write_pose_h5(path, n, img_size=48, with_landmarks=True, seed=0):
    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        ds = create_pose_dataset(f, FieldCategory.image, count=n)
        for i in range(n):
            ds[i] = (rng.rand(img_size, img_size) * 255).astype(np.uint8)
        quats = rng.randn(n, 4).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        create_pose_dataset(f, FieldCategory.quat, count=n, dtype=np.float32, data=quats)
        coords = np.stack(
            [rng.rand(n) * img_size, rng.rand(n) * img_size, rng.rand(n) * 10 + 5], axis=-1
        ).astype(np.float32)
        create_pose_dataset(f, FieldCategory.xys, count=n, dtype=np.float32, data=coords)
        rois = np.stack(
            [np.full(n, 8.0), np.full(n, 8.0), np.full(n, 40.0), np.full(n, 40.0)], axis=-1
        ).astype(np.float32)
        create_pose_dataset(f, FieldCategory.roi, count=n, dtype=np.float32, data=rois)
        if with_landmarks:
            create_pose_dataset(
                f, FieldCategory.points, name="pt3d_68", count=n, shape_wo_batch_dim=(68, 3),
                dtype=np.float32, data=(rng.rand(n, 68, 3) * 30 + 8).astype(np.float32),
            )
            create_pose_dataset(
                f, FieldCategory.general, name="shapeparams", count=n,
                shape_wo_batch_dim=(50,), dtype=np.float16,
                data=rng.randn(n, 50).astype(np.float16),
            )


def test_fused_batch_loader(tmp_path):
    p1 = str(tmp_path / "a.h5")
    p2 = str(tmp_path / "b.h5")
    write_pose_h5(p1, 10, seed=1)
    write_pose_h5(p2, 6, with_landmarks=False, seed=2)
    ds1 = Hdf5PoseDataset(p1, dataclass=Tag.POSE_WITH_LANDMARKS)
    ds2 = Hdf5PoseDataset(p2, dataclass=Tag.ONLY_POSE, coord_convention_id=1)
    concat = ConcatDataset([ds1, ds2])
    sampler = make_concat_dataset_item_sampler(concat, [0.5, 0.5], stop_after=200, seed=3)
    tags = [Tag.POSE_WITH_LANDMARKS, Tag.ONLY_POSE]
    loader = FusedBatchLoader(
        concat,
        tags_by_dataset_index=lambda i: tags[i],
        tag_to_id={t: i for i, t in enumerate(tags)},
        sampler=sampler,
        batchsize=8,
        pad_size=64,
    )
    it = iter(loader)
    seen_tags = set()
    for _ in range(5):
        batch = next(it)
        assert batch["image"].shape == (8, 64, 64, 1)
        assert batch["image"].dtype == np.uint8
        assert batch["pose"].shape == (8, 4)
        assert batch["pt3d_68"].shape == (8, 68, 3)
        assert batch["tag_id"].shape == (8,)
        seen_tags.update(batch["tag_id"].tolist())
        # coord_convention_id follows the dataset
        ccids = batch["coord_convention_id"]
        np.testing.assert_array_equal(ccids, np.where(batch["tag_id"] == 1, 1, 0))
    assert seen_tags == {0, 1}


def test_pack_fused_batch_oversized_image_grows_padding(tmp_path):
    """An image exceeding pad_size grows this batch's padding to the next
    64-multiple instead of failing (costs one extra compile per new bucket)."""
    p = str(tmp_path / "c.h5")
    write_pose_h5(p, 2, img_size=100)
    ds = Hdf5PoseDataset(p, dataclass=Tag.ONLY_POSE)
    batch = pack_fused_batch([ds[0]], [0], pad_size=64)
    assert batch["image"].shape == (1, 128, 128, 1)
    np.testing.assert_array_equal(
        batch["image"][0, :100, :100, 0], np.asarray(ds[0]["image"])[..., 0]
    )
    assert not batch["image"][0, 100:, :, 0].any()


def _make_loader(tmp_path, num_workers, worker_type, stop_after=64, seed=3,
                 shared_memory=True):
    p1 = str(tmp_path / "mw.h5")
    if not os.path.isfile(p1):
        write_pose_h5(p1, 12, seed=4)
    ds1 = Hdf5PoseDataset(p1, dataclass=Tag.ONLY_POSE)
    concat = ConcatDataset([ds1])
    sampler = make_concat_dataset_item_sampler(concat, [1.0], stop_after=stop_after, seed=seed)
    return FusedBatchLoader(
        concat,
        tags_by_dataset_index=lambda i: Tag.ONLY_POSE,
        tag_to_id={Tag.ONLY_POSE: 0},
        sampler=sampler,
        batchsize=8,
        pad_size=64,
        num_workers=num_workers,
        worker_type=worker_type,
        shared_memory=shared_memory,
    )


def test_fused_batch_loader_multiworker(tmp_path):
    loader = _make_loader(tmp_path, num_workers=3, worker_type="thread")
    batches = list(iter(loader))
    # 64 samples / 8 per batch: the planner cuts exact batches up front, so
    # nothing is dropped at stream end regardless of worker count.
    assert len(batches) == 8
    for b in batches:
        assert b["image"].shape == (8, 64, 64, 1)
        assert b["pose"].shape == (8, 4)


def test_fused_batch_loader_deterministic_across_workers(tmp_path):
    """Batch composition is pre-planned: the stream is bit-identical for any
    worker count and worker type (fixes the determinism/multi-worker
    exclusivity of earlier revisions)."""
    ref = list(iter(_make_loader(tmp_path, 1, "thread")))
    # process workers covered with BOTH transports: shared-memory image ring
    # (default) and pure-pickle fallback
    for nw, wt, shm in ((3, "thread", True), (2, "process", True), (2, "process", False)):
        got = list(iter(_make_loader(tmp_path, nw, wt, shared_memory=shm)))
        assert len(got) == len(ref), (nw, wt)
        for a, b in zip(ref, got):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{nw}/{wt}/{shm}/{k}")


def test_fused_batch_loader_process_workers_error_propagates(tmp_path):
    loader = _make_loader(tmp_path, num_workers=2, worker_type="process")
    # Poison the dataset AFTER construction: the pickled copy in the worker
    # raises on load and the exception must surface in the parent.
    loader.ds.datasets[0].transform = _Boom()
    with pytest.raises(Exception, match="boom"):
        list(iter(loader))


class _Boom:
    def __call__(self, sample):
        raise RuntimeError("boom")


class _ExplodingSampler:
    """Yields a few valid indices, then fails (sampler error mid-stream)."""

    def __init__(self, n_good, n_items):
        self.n_good = n_good
        self.n_items = n_items

    def __iter__(self):
        for i in range(self.n_good):
            yield i % self.n_items
        raise RuntimeError("sampler exploded")


@pytest.mark.parametrize("nw,wt", [(1, "thread"), (2, "thread"), (2, "process")])
def test_sampler_error_reaches_consumer(tmp_path, nw, wt):
    """A sampler/planner exception on the feeder thread must propagate to the
    consumer, not read as a clean end-of-stream (silent data truncation)."""
    loader = _make_loader(tmp_path, num_workers=nw, worker_type=wt)
    loader.sampler = _ExplodingSampler(16, len(loader.ds))
    got = []
    with pytest.raises(RuntimeError, match="sampler exploded"):
        for b in iter(loader):
            got.append(b)
    # The two fully-planned batches still arrive before the error surfaces.
    assert len(got) == 2


def test_single_process_worker_honors_backend(tmp_path):
    """worker_type='process' runs the process backend even at one worker, so
    a request for process isolation (decode CPU off the trainer process) is
    never silently downgraded to threads."""
    loader = _make_loader(tmp_path, num_workers=1, worker_type="process")
    assert loader.worker_type == "process"
    ref = [b["image"] for b in _make_loader(tmp_path, 1, "thread")]
    got = [b["image"] for b in loader]
    assert len(got) == len(ref) == 8
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_make_pose_estimation_loaders_registry(tmp_path, monkeypatch):
    # Wire a synthetic aflw2k.h5 through the real registry entry point.
    datadir = tmp_path / "data"
    datadir.mkdir()
    write_pose_h5(str(datadir / "aflw2k.h5"), 420)
    monkeypatch.setenv("DATADIR", str(datadir))

    from neuralnet_tracker_traincode_tpu import pipelines

    train_loader, test_set, size, tag_order, aug_cfg = pipelines.make_pose_estimation_loaders(
        inputsize=65,
        batchsize=4,
        datasets=[Id.AFLW2k3d],
        pad_size=64,
        seed=5,
    )
    assert size == 20  # aflw2k train split = samples beyond the first 400
    batch = next(iter(train_loader))
    assert batch["image"].shape == (4, 64, 64, 1)
    assert aug_cfg.inputsize == 65
    assert Tag.POSE_WITH_LANDMARKS in tag_order
    # validation set yields Batch samples with landmark-derived rois
    sample = test_set[0]
    assert "roi" in sample


def test_validation_loader(tmp_path, monkeypatch):
    datadir = tmp_path / "data"
    datadir.mkdir()
    write_pose_h5(str(datadir / "aflw2k.h5"), 8)
    monkeypatch.setenv("DATADIR", str(datadir))
    from neuralnet_tracker_traincode_tpu import pipelines

    loader = pipelines.make_validation_loader("aflw2k3d", use_head_roi=False)
    samples = list(loader)
    assert len(samples) > 0
    s = samples[0]
    # roi rebuilt from landmarks
    lm = np.asarray(s["pt3d_68"])
    np.testing.assert_allclose(np.asarray(s["roi"])[:2], lm[:, :2].min(axis=0), atol=1e-4)


def test_raw_jpeg_fast_path_matches_decoded(tmp_path):
    """pack_fused_batch over RawJpegBuffer samples is bit-identical to the
    decoded path (both run libjpeg) and the pipeline flag enables it."""
    from neuralnet_tracker_traincode_tpu.data.fields import Tag
    from neuralnet_tracker_traincode_tpu.data.hdf5 import RawJpegBuffer
    from neuralnet_tracker_traincode_tpu.data.loader import pack_fused_batch
    from neuralnet_tracker_traincode_tpu.data.pose_dataset import Hdf5PoseDataset

    p = str(tmp_path / "raw.h5")
    write_pose_h5(p, 6, img_size=48)
    ds_dec = Hdf5PoseDataset(p, dataclass=Tag.POSE_WITH_LANDMARKS)
    ds_raw = Hdf5PoseDataset(p, dataclass=Tag.POSE_WITH_LANDMARKS)
    ds_raw.use_raw_images = True

    s_raw = ds_raw[0]
    assert isinstance(s_raw["image"], RawJpegBuffer)
    assert s_raw["image"].shape == ds_dec[0]["image"].shape
    assert s_raw.meta.image_wh == ds_dec[0].meta.image_wh

    dec = pack_fused_batch([ds_dec[i] for i in range(6)], [0] * 6, pad_size=64)
    raw = pack_fused_batch([ds_raw[i] for i in range(6)], [0] * 6, pad_size=64)
    np.testing.assert_array_equal(dec["image"], raw["image"])
    for k in dec:
        np.testing.assert_array_equal(dec[k], raw[k])


def test_seeded_loader_stream_is_deterministic(tmp_path, monkeypatch):
    """make_pose_estimation_loaders(seed=N) must yield an identical batch
    stream across constructions AND across worker counts (batch composition
    is pre-planned; workers only execute plans)."""
    import neuralnet_tracker_traincode_tpu.pipelines as pipelines

    d = tmp_path / "det_datadir"
    d.mkdir()
    write_pose_h5(str(d / "aflw2k.h5"), 640, seed=9)
    monkeypatch.setenv("DATADIR", str(d))

    def first_batches(n=3, num_workers=1):
        loader, _, _, _, _ = pipelines.make_pose_estimation_loaders(
            inputsize=129, batchsize=8, datasets=[pipelines.Id.AFLW2k3d],
            enable_image_aug=False, seed=777, num_workers=num_workers,
        )
        loader.worker_type = "thread"  # worker-count determinism; process
        # backend covered in test_fused_batch_loader_deterministic_across_workers
        it = iter(loader)
        return [next(it) for _ in range(n)]

    a = first_batches()
    for nw in (1, 3):
        b = first_batches(num_workers=nw)
        for ba, bb in zip(a, b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=f"nw={nw}/{k}")
