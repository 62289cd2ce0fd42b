"""Batch container & collation semantics (mirrors `test/test_batch.py`)."""

import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.data.batch import Batch, Metadata
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory


def make_sample(i, tag="A", with_seq=False, n=1):
    if with_seq:
        meta = Metadata(64, 0, tag, seq=[0, n])
        data = {"image": np.full((n, 64, 64, 1), i, np.uint8), "coord": np.full((n, 3), i, np.float32)}
    else:
        meta = Metadata(64, 0, tag)
        data = {"image": np.full((64, 64, 1), i, np.uint8), "coord": np.full((3,), i, np.float32)}
    meta.categories = {"image": FieldCategory.image, "coord": FieldCategory.xys}
    return Batch(meta, data)


def test_metadata_prefixshape():
    assert Metadata(64, 0).prefixshape == ()
    assert Metadata(64, 5).prefixshape == (5,)
    assert Metadata(64, 2, seq=[0, 3, 7]).prefixshape == (7,)
    assert Metadata(64, 0).is_single_frame
    assert not Metadata(64, 1).is_single_frame


def test_collate_stills():
    batch = Batch.collate([make_sample(i) for i in range(4)])
    assert batch.meta.batchsize == 4
    assert batch["image"].shape == (4, 64, 64, 1)
    assert batch["coord"].shape == (4, 3)
    np.testing.assert_array_equal(batch["coord"][:, 0], [0, 1, 2, 3])
    assert batch.get_category("coord") == FieldCategory.xys


def test_collate_videos():
    samples = [make_sample(1, with_seq=True, n=3), make_sample(2, with_seq=True, n=2)]
    batch = Batch.collate(samples)
    assert batch.meta.seq == [0, 3, 5]
    assert batch.meta.batchsize == 2
    assert batch["image"].shape == (5, 64, 64, 1)
    assert batch.meta.prefixshape == (5,)


def test_segmented_collation():
    collation = Batch.Collation(key_getter=lambda b: b.meta.tag)
    samples = [make_sample(0, "A"), make_sample(1, "B"), make_sample(2, "A")]
    batches = collation(samples)
    assert len(batches) == 2
    by_tag = {b.meta.tag: b for b in batches}
    assert by_tag["A"].meta.batchsize == 2
    assert by_tag["B"].meta.batchsize == 1


def test_undo_collate_stills():
    batch = Batch.collate([make_sample(i) for i in range(3)])
    frames = list(batch.undo_collate())
    assert len(frames) == 3
    for i, f in enumerate(frames):
        assert f.meta.batchsize == 0
        np.testing.assert_array_equal(f["coord"], np.full((3,), i))


def test_undo_collate_sequences():
    samples = [make_sample(1, with_seq=True, n=3), make_sample(2, with_seq=True, n=2)]
    batch = Batch.collate(samples)
    seqs = list(batch.undo_collate())
    assert len(seqs) == 2
    assert seqs[0]["image"].shape[0] == 3
    assert seqs[1]["image"].shape[0] == 2
    np.testing.assert_array_equal(seqs[1]["coord"], np.full((2, 3), 2))


def test_with_batchdim():
    s = make_sample(7)
    b = s.with_batchdim()
    assert b.meta.batchsize == 1
    assert b["image"].shape == (1, 64, 64, 1)


def test_from_data_with_categories():
    meta = Metadata(32, 0)
    b = Batch.from_data_with_categories(
        meta, {"roi": (np.zeros(4), FieldCategory.roi)}
    )
    assert b.get_category("roi") == FieldCategory.roi
    # Source metadata must not be mutated.
    assert "roi" not in meta.categories
