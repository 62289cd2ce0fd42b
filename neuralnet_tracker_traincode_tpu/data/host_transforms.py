"""Host-side (numpy) per-sample transforms for validation/eval loaders.

The training path does all of this on device; these numpy twins exist for the
sample-by-sample eval loaders where per-sample device dispatch would dominate.
Contract: `datatransformation/batch/misc.py` (PutRoiFromLandmarks) and
`normalization.py` (half-pixel offset).
"""

from typing import Optional

import numpy as np
from scipy.spatial.transform import Rotation

from neuralnet_tracker_traincode_tpu.data.batch import Batch
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory


def offset_points_by_half_pixel_np(sample: Batch) -> Batch:
    sample = sample.copy()
    for k, v in sample.items():
        c = sample.get_category(k)
        if c == FieldCategory.points:
            v = np.array(v, copy=True)
            v[..., :2] += 0.5
            sample[k] = v
        elif c == FieldCategory.xys:
            v = np.array(v, copy=True)
            v[..., :2] += 0.5
            sample[k] = v
    return sample


class PutRoiFromLandmarks:
    """Rebuild the face roi from the 68 landmarks.

    extend_to_forehead=True in the reference uses the full posed BFM mesh AABB
    (`misc.py:9-31`). The full mesh requires the non-distributable blob; when
    only the keypoint subset is available we approximate the posed head extent
    with the head sphere (center coord[:2], radius coord[2]) merged with the
    landmark bbox — the BFM is scaled to head-radius units so the cranium lies
    on that sphere.
    """

    def __init__(self, extend_to_forehead: bool = False):
        self.extend_to_forehead = extend_to_forehead
        self._full_model = None
        if extend_to_forehead:
            self._full_model = _try_load_full_model()

    def __call__(self, sample: Batch) -> Batch:
        if "pt3d_68" not in sample:
            return sample
        sample = sample.copy()
        lm = np.asarray(sample["pt3d_68"])
        if self.extend_to_forehead:
            if self._full_model is not None:
                verts = self._posed_vertices(sample)
                min_ = np.amin(verts[..., :2], axis=-2)
                max_ = np.amax(verts[..., :2], axis=-2)
            else:
                coord = np.asarray(sample["coord"])
                c, s = coord[..., :2], coord[..., 2:]
                lmin = np.amin(lm[..., :2], axis=-2)
                lmax = np.amax(lm[..., :2], axis=-2)
                min_ = np.minimum(lmin, c - s)
                max_ = np.maximum(lmax, c + s)
        else:
            min_ = np.amin(lm[..., :2], axis=-2)
            max_ = np.amax(lm[..., :2], axis=-2)
        sample["roi"] = np.concatenate([min_, max_], axis=-1).astype(np.float32)
        sample.meta.categories["roi"] = FieldCategory.roi
        return sample

    def _posed_vertices(self, sample):
        model = self._full_model
        shapeparams = np.asarray(sample.get("shapeparam", np.zeros((50,), np.float32)))
        verts = model.scaled_vertices + np.einsum(
            "k,kvd->vd", shapeparams, model.scaled_bases
        )
        coord = np.asarray(sample["coord"])
        rot = Rotation.from_quat(np.asarray(sample["pose"]))
        out = rot.apply(verts) * coord[..., 2]
        out[..., :2] += coord[..., :2]
        return out


def _try_load_full_model():
    import os
    from os.path import isfile

    from neuralnet_tracker_traincode_tpu.facemodel.bfm import FullBFMModel

    path = os.environ.get("BFM_PATH")
    if path and isfile(path):
        return FullBFMModel(path)
    return None
