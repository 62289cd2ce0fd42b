"""The fused on-device training augmentation pipeline.

This is the TPU-first replacement for the reference's CPU-worker transform
stack (`pipelines.py:372-389` + loader postprocess `pipelines.py:504-532`):

    half-pixel offset -> RandomFocusRoi crop warp -> flip/rot90 ->
    normalize -> intensity augs -> gaussian noise -> whiten

All stages compose into ONE jitted program over the padded uint8 batch; the
flip/rot90 is composed into the crop affine so there is exactly one image
resampling. Labels are transformed with the matched affine in the same program.
The host only decodes JPEGs and pads images to a fixed size.
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.augmentation.affine import (
    apply_affine2d,
    position_normalization,
)
from neuralnet_tracker_traincode_tpu.augmentation.geometric import (
    flip_rot90_transform,
    focus_roi_components,
    focus_roi_transform,
    make_roi_randomization_parameters,
    no_roi_randomization,
    sample_flip_rot90,
    share_params_within_sequences,
)
from neuralnet_tracker_traincode_tpu.augmentation.intensity import intensity_augmentation
from neuralnet_tracker_traincode_tpu.augmentation.warp import warp_affine
from neuralnet_tracker_traincode_tpu.augmentation.warp_fast import warp_roi_rotate
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d


class TrainAugmentationConfig(NamedTuple):
    inputsize: int = 129
    rotation_aug_angle: float = 30.0
    extension_factor: float = 1.1
    enable_image_aug: bool = True
    p_flip_rot90: float = 0.01
    enable_flip: bool = True
    oversample: int = 2
    roi_key: str = "roi"
    deterministic: bool = False  # validation: fixed crop, no flip/intensity


_POINTISH = (FieldCategory.points, FieldCategory.xys)


def _offset_half_pixel(labels: Dict[str, Any], categories: Dict[str, FieldCategory]):
    tr = Affine2d.trs(translations=jnp.asarray([0.5, 0.5], jnp.float32))
    out = dict(labels)
    for k, v in labels.items():
        if categories.get(k) in _POINTISH:
            out[k] = apply_affine2d(tr, k, v, categories[k])
    return out


def _transform_labels(labels, categories, tr: Affine2d):
    out = dict(labels)
    for k, v in labels.items():
        c = categories.get(k, FieldCategory.general)
        if c not in (FieldCategory.image, FieldCategory.semseg):
            out[k] = apply_affine2d(tr, k, v, c)
    return out


def _normalize_labels(labels, categories, size: int):
    tr = position_normalization(size, size)
    out = dict(labels)
    for k, v in labels.items():
        c = categories.get(k, FieldCategory.general)
        if c in (FieldCategory.image, FieldCategory.semseg):
            continue
        if hasattr(v, "dtype") and v.dtype == jnp.bool_:
            out[k] = jnp.where(v, 0.9, 0.1).astype(jnp.float32)  # label smoothing
        else:
            out[k] = apply_affine2d(tr, k, v, c)
    return out


def augment_batch_for_training(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, C) uint8, zero-padded to a fixed size
    labels: Dict[str, jax.Array],
    categories: Dict[str, FieldCategory],
    cfg: TrainAugmentationConfig,
    param_index: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One fused program: crop-warp + flip/rot90 + intensity + normalize + whiten.

    Returns (whitened float32 images (B, S, S, C), normalized labels).
    `labels[cfg.roi_key]` must hold the face bbox in source pixels.
    """
    B = images.shape[0]
    k_roi, k_fliprot, k_intensity = jax.random.split(key, 3)

    labels = _offset_half_pixel(labels, categories)

    if cfg.deterministic:
        params = no_roi_randomization((B,), cfg.extension_factor)
    else:
        params = make_roi_randomization_parameters(
            k_roi, (B,), cfg.rotation_aug_angle, cfg.extension_factor
        )
        if param_index is not None:
            params = share_params_within_sequences(params, param_index)
    view_roi, tr = focus_roi_components(labels[cfg.roi_key], params, cfg.inputsize)

    do_flip = rot_dir = None
    if cfg.enable_flip and not cfg.deterministic:
        do_flip, rot_dir = sample_flip_rot90(k_fliprot, (B,), cfg.p_flip_rot90)
        if param_index is not None:
            do_flip, rot_dir = do_flip[param_index], rot_dir[param_index]
        tr = flip_rot90_transform(do_flip, rot_dir, cfg.inputsize) @ tr

    # Gather-free MXU/VPU warp (see warp_fast.py; fused Pallas kernel on
    # TPU, warp_pallas.py): same geometry as `warp_affine(images, tr, ...)`,
    # 2.25 ms vs 2246 ms at b512/448^2 by honest slope timing
    # (docs/PERFORMANCE.md).
    warped = warp_roi_rotate(
        images,
        view_roi,
        params.angles,
        cfg.inputsize,
        cfg.rotation_aug_angle,
        do_flip=do_flip,
        rot_dir=rot_dir,
        skip_rotation=cfg.deterministic or not cfg.rotation_aug_angle,
    )
    labels = _transform_labels(labels, categories, tr)
    labels = _normalize_labels(labels, categories, cfg.inputsize)

    x = warped * (1.0 / 256.0)
    if cfg.enable_image_aug and not cfg.deterministic:
        x = intensity_augmentation(k_intensity, x)
    x = x - 0.5  # whiten
    return x, labels


def crop_for_eval(
    images: jax.Array,
    roi: jax.Array,
    inputsize: int,
    expansion_factor: float = 1.2,
    oversample: int = 2,
) -> Tuple[jax.Array, jax.Array]:
    """Deterministic eval crop; returns (whitened images, backtransform (B, 2, 3)).

    Matches FocusRoi(...) + normalize + whiten (`eval.py:170-199`): no rounding
    randomization, expansion factor only.
    """
    B = images.shape[0]
    params = no_roi_randomization((B,), expansion_factor)
    tr = focus_roi_transform(roi, params, inputsize)
    warped = warp_affine(images, tr, inputsize, oversample)
    x = warped * (1.0 / 256.0) - 0.5
    return x, tr.inv().tensor()
