"""BFM head model reconstructs GT landmarks of the bundled fixture.

Mirrors `test/test_landmarks.py:23-52`: load aflw2kmini.h5, run the posed
deformable head on GT pose/coord/shape params, require < 0.01 normalized error.
"""

from os.path import isfile

import jax.numpy as jnp
import numpy as np
import pytest

from neuralnet_tracker_traincode_tpu.augmentation.normalization import (
    normalize_batch,
    offset_points_by_half_pixel,
)
from neuralnet_tracker_traincode_tpu.data.batch import Batch
from neuralnet_tracker_traincode_tpu.data.pose_dataset import Hdf5PoseDataset
from neuralnet_tracker_traincode_tpu.models.components import (
    DeformableHeadKeypoints,
    PosedDeformableHead,
)
from neuralnet_tracker_traincode_tpu.ops.rotrepr import QuatRepr

AFLW2KMINI = "/root/reference/aflw2kmini.h5"


@pytest.mark.skipif(not isfile(AFLW2KMINI), reason="aflw2kmini.h5 fixture not available")
def test_landmarks():
    headmodel = PosedDeformableHead(DeformableHeadKeypoints())

    def transform(s):
        return normalize_batch(offset_points_by_half_pixel(s))

    ds = Hdf5PoseDataset(AFLW2KMINI, transform=transform)
    batch = Batch.collate([smpl for smpl in ds])
    pred = headmodel(
        jnp.asarray(batch["coord"]), QuatRepr(jnp.asarray(batch["pose"])), jnp.asarray(batch["shapeparam"])
    )
    target = np.asarray(batch["pt3d_68"])
    diff = np.mean(np.linalg.norm(np.asarray(pred) - target, axis=-1), axis=-1)
    assert np.max(diff) < 0.01, f"Landmark reconstruction error too large: {np.max(diff)}"
