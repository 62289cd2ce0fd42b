"""Batch normalization transforms: coords to [-1, 1], images to [0, 1], whitening.

Contract: `trackertraincode/datatransformation/batch/normalization.py` and
`tensors/normalization.py` (whiten = subtract 0.5). Pixel-center convention:
points are offset by +0.5 px before normalization.
"""

import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.augmentation.affine import (
    apply_affine2d,
    position_normalization,
    position_unnormalization,
)
from neuralnet_tracker_traincode_tpu.data.batch import Batch
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory, imagelike_categories
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d


def whiten_image(image):
    return image - 0.5


def unwhiten_image(image):
    return image + 0.5


def _is_bool(v) -> bool:
    return np.asarray(v).dtype == np.bool_ if isinstance(v, np.ndarray) else v.dtype == jnp.bool_


def normalize_batch(sample: Batch) -> Batch:
    """Coordinates -> [-1, 1]; image color -> [0, 1]; bools -> smoothed labels."""

    def _normalize_bool(x, smooth=0.1):
        return jnp.where(jnp.asarray(x), 1.0 - smooth, smooth).astype(jnp.float32)

    def _normalize_image(x):
        return jnp.asarray(x).astype(jnp.float32) * (1.0 / 256)

    W, H = sample.meta.image_wh
    tr = position_normalization(W, H)
    sample = sample.copy()
    for k, v in sample.items():
        category = sample.get_category(k)
        if category == FieldCategory.image:
            sample[k] = _normalize_image(v)
        elif category == FieldCategory.semseg:
            sample[k] = jnp.asarray(v).astype(jnp.int32)
        elif _is_bool(v):
            sample[k] = _normalize_bool(v)
        else:
            sample[k] = apply_affine2d(tr, k, jnp.asarray(v), category)
    return sample


def unnormalize_batch(sample: Batch) -> Batch:
    W, H = sample.meta.image_wh
    tr = position_unnormalization(W, H)
    sample = sample.copy()
    for k, v in sample.items():
        category = sample.get_category(k)
        if category == FieldCategory.image:
            sample[k] = jnp.clip(jnp.asarray(v) * 256.0, 0.0, 255.0).astype(jnp.uint8)
        else:
            sample[k] = apply_affine2d(tr, k, jnp.asarray(v), category)
    return sample


def offset_points_by_half_pixel(sample: Batch) -> Batch:
    """Pixel-center convention: shift point-like labels by +(0.5, 0.5)."""
    sample = sample.copy()
    tr = Affine2d.trs(translations=jnp.asarray([0.5, 0.5], jnp.float32))
    for k, v in sample.items():
        c = sample.get_category(k)
        if c in (FieldCategory.points, FieldCategory.xys):
            sample[k] = apply_affine2d(tr, k, jnp.asarray(v), c)
    return sample


def whiten_batch(batch: Batch) -> Batch:
    batch = batch.copy()
    for k, v in batch.items():
        if batch.get_category(k) in imagelike_categories:
            batch[k] = whiten_image(v)
    return batch
