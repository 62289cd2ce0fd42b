"""Euler conversion utilities (mirrors `test/test_utils.py`)."""

import numpy as np
from scipy.spatial.transform import Rotation

from neuralnet_tracker_traincode_tpu import utils


def test_hpb_roundtrip(rng):
    hpb = rng.uniform(-1.0, 1.0, size=(16, 3))
    rot = utils.from_hpb(hpb)
    back = utils.as_hpb(rot)
    np.testing.assert_allclose(back, hpb, atol=1e-6)


def test_aflw_rotation_roundtrip(rng):
    pyr = rng.uniform(-1.2, 1.2, size=(32, 3))
    rot = utils.aflw_rotation_conversion(pyr[:, 0], pyr[:, 1], pyr[:, 2])
    back = utils.inv_aflw_rotation_conversion(rot)
    np.testing.assert_allclose(back, pyr, atol=1e-6)


def test_aflw_identity():
    rot = utils.aflw_rotation_conversion(np.zeros(1), np.zeros(1), np.zeros(1))
    np.testing.assert_allclose(rot.as_matrix()[0], np.eye(3), atol=1e-12)


def test_iter_batched():
    out = list(utils.iter_batched(range(10), 3))
    assert out == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]


def test_cycle():
    it = utils.cycle([1, 2])
    assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]
