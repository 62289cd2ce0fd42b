"""Sampler statistics (mirrors `test/test_samplers.py`)."""

import numpy as np

from neuralnet_tracker_traincode_tpu.data import sampling


class _FakeDs(sampling.Dataset):
    def __init__(self, n, offset):
        self._n = n
        self._offset = offset

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return self._offset + i


def test_concat_dataset():
    ds = sampling.ConcatDataset([_FakeDs(3, 0), _FakeDs(2, 100)])
    assert len(ds) == 5
    assert [ds[i] for i in range(5)] == [0, 1, 2, 100, 101]


def test_subset():
    ds = sampling.Subset(_FakeDs(10, 0), [3, 5])
    assert len(ds) == 2
    assert ds[1] == 5


def test_concat_sampler_frequencies():
    datasets = [_FakeDs(50, 0), _FakeDs(100, 0), _FakeDs(10, 0)]
    concat = sampling.ConcatDataset(datasets)
    weights = [0.5, 0.25, 0.25]
    sampler = sampling.make_concat_dataset_item_sampler(
        concat, weights, stop_after=8000, seed=123
    )
    indices = np.asarray(list(sampler))
    assert indices.min() >= 0 and indices.max() < len(concat)
    bounds = [0, 50, 150, 160]
    counts = np.histogram(indices, bins=bounds)[0] / len(indices)
    np.testing.assert_allclose(counts, weights, atol=0.02)


def test_sampler_covers_small_dataset():
    # The inner sampler cycles, so even a tiny dataset gets full coverage.
    datasets = [_FakeDs(4, 0)]
    concat = sampling.ConcatDataset(datasets)
    sampler = sampling.make_concat_dataset_item_sampler(concat, [1.0], stop_after=64, seed=7)
    seen = set(sampler)
    assert seen == {0, 1, 2, 3}


def test_sobol_choices():
    choices = sampling.SobolChoices([0.7, 0.3], seed=5)
    draws = np.asarray([choices() for _ in range(512)])
    frac = np.mean(draws == 0)
    assert abs(frac - 0.7) < 0.05


def test_sampler_is_reiterable():
    concat = sampling.ConcatDataset([_FakeDs(8, 0), _FakeDs(8, 0)])
    sampler = sampling.make_concat_dataset_item_sampler(concat, [0.5, 0.5], stop_after=20, seed=3)
    a = list(sampler)
    b = list(sampler)
    assert len(a) == len(b) == 20
    assert all(0 <= i < 16 for i in a + b)
