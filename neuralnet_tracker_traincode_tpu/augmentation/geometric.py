"""ROI-focus crop augmentation, batched and on-device.

Contract: `trackertraincode/datatransformation/batch/geometric.py`:
 - expand/scale/translate the face bbox (gaussian scale clip(+-0.5)+ext,
   translation within the wiggle room, optional +-`angle` in-plane rotation
   with p=1/3), build the crop->out_size transform, warp the image and apply
   the matched label transforms; video sequences share the first frame's
   randomization; eval inserts the inverse transform for backtransforming
   predictions.

Everything runs under jit with jax.random keys (the reference does this per
sample with numpy + cv2 on CPU workers).
"""

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.augmentation.affine import apply_affine2d
from neuralnet_tracker_traincode_tpu.augmentation.warp import warp_affine
from neuralnet_tracker_traincode_tpu.data.batch import Batch
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d

MAX_BEYOND_BORDER_SHIFT = 0.3


class RoiFocusRandomizationParameters(NamedTuple):
    scales: jax.Array  # (B,)
    angles: jax.Array  # (B,)
    translations: jax.Array  # (B, 2)


def make_roi_randomization_parameters(
    key: jax.Array,
    batchshape,
    rotation_aug_angle: float = 30.0,
    extension_factor: float = 1.1,
) -> RoiFocusRandomizationParameters:
    """Sample crop randomization (`geometric.py:58-84`)."""
    k_scale, k_transl, k_sign, k_onoff = jax.random.split(key, 4)
    scales = (
        jnp.clip(jax.random.normal(k_scale, batchshape) * 0.1, -0.5, 0.5) + extension_factor
    )
    translations = jnp.clip(jax.random.normal(k_transl, batchshape + (2,)) * 0.5, -1.0, 1.0)
    if rotation_aug_angle:
        angles = jnp.full(batchshape, math.pi * rotation_aug_angle / 180.0)
        angles = angles * jnp.where(jax.random.bernoulli(k_sign, 0.5, batchshape), 1.0, -1.0)
        angles = angles * jax.random.bernoulli(k_onoff, 1.0 / 3.0, batchshape)
    else:
        angles = jnp.zeros(batchshape)
    return RoiFocusRandomizationParameters(scales, angles, translations)


def no_roi_randomization(batchshape, extent_factor: float) -> RoiFocusRandomizationParameters:
    return RoiFocusRandomizationParameters(
        scales=jnp.full(batchshape, extent_factor),
        angles=jnp.zeros(batchshape),
        translations=jnp.zeros(batchshape + (2,)),
    )


def share_params_within_sequences(
    params: RoiFocusRandomizationParameters, param_index: jax.Array
) -> RoiFocusRandomizationParameters:
    """Video consistency: every frame uses the params of its sequence start.

    `param_index` maps each sample to the batch row whose params it should use
    (identity for still images); computed host-side from Metadata.seq.
    """
    return RoiFocusRandomizationParameters(
        scales=params.scales[param_index],
        angles=params.angles[param_index],
        translations=params.translations[param_index],
    )


def compute_view_roi(
    face_bbox: jax.Array,
    enlargement_factor: jax.Array,
    translation_factor: jax.Array,
    beyond_border_shift: float,
) -> jax.Array:
    """Expanded and shifted square ROI around the face bbox (`geometric.py:107-157`)."""
    assert face_bbox.shape[:-1] == enlargement_factor.shape
    x0, y0, x1, y1 = jnp.moveaxis(face_bbox, -1, 0)
    rx, ry = jnp.moveaxis(translation_factor, -1, 0)
    bbox_w = x1 - x0
    bbox_h = y1 - y0
    cx = 0.5 * (x1 + x0)
    cy = 0.5 * (y1 + y0)
    size = jnp.maximum(bbox_w, bbox_h) * enlargement_factor
    wiggle_room_x = 0.5 * jnp.abs(size - bbox_w) + beyond_border_shift * jnp.minimum(size, bbox_w)
    wiggle_room_y = 0.5 * jnp.abs(size - bbox_h) + beyond_border_shift * jnp.minimum(size, bbox_h)
    tx = wiggle_room_x * rx
    ty = wiggle_room_y * ry
    return jnp.stack(
        [cx - size * 0.5 + tx, cy - size * 0.5 + ty, cx + size * 0.5 + tx, cy + size * 0.5 + ty],
        axis=-1,
    )


def _point_transform_from_roi(view_roi: jax.Array, new_size: int) -> Affine2d:
    B = view_roi.shape[:-1]
    return Affine2d.range_remap_2d(
        inmin=view_roi[..., :2],
        inmax=view_roi[..., 2:],
        outmin=jnp.zeros(B + (2,), jnp.float32),
        outmax=jnp.full(B + (2,), float(new_size), jnp.float32),
    )


def _center_rotation_tr(angles: jax.Array, new_size: int) -> Affine2d:
    half = 0.5 * float(new_size)
    tr_norm = Affine2d.range_remap_2d([0.0, 0.0], [new_size, new_size], [-1.0, -1.0], [1.0, 1.0])
    tr_rot = Affine2d.trs(angles=angles)
    tr_denorm = Affine2d.range_remap_2d([-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [new_size, new_size])
    return tr_denorm @ tr_rot @ tr_norm


def focus_roi_components(
    roi: jax.Array,
    params: RoiFocusRandomizationParameters,
    new_size: int,
    round_roi: bool = True,
) -> tuple:
    """(view_roi, transform) pair: the expanded/rounded square view ROI and the
    full source->crop Affine2d (= center rotation @ axis-aligned remap).

    The gather-free warp (`warp_fast.warp_roi_rotate`) consumes the components
    (view_roi + angles) directly; the label path uses the composed transform.
    """
    view_roi = compute_view_roi(roi, params.scales, params.translations, MAX_BEYOND_BORDER_SHIFT)
    if round_roi:
        view_roi = jnp.round(view_roi)
    tr = _point_transform_from_roi(view_roi, new_size)
    return view_roi, _center_rotation_tr(params.angles, new_size) @ tr


def focus_roi_transform(
    roi: jax.Array,
    params: RoiFocusRandomizationParameters,
    new_size: int,
    round_roi: bool = True,
) -> Affine2d:
    """Per-sample source->crop transform (roi expansion + in-plane rotation)."""
    return focus_roi_components(roi, params, new_size, round_roi)[1]


def focus_roi_batch(
    batch: Batch,
    tr: Affine2d,
    new_size: int,
    oversample: int = 2,
    insert_backtransform: bool = False,
) -> Batch:
    """Apply the crop transform to image + all labels of a (device) Batch."""
    W, H = batch.meta.image_wh
    out = batch.copy()
    for k, v in batch.items():
        c = batch.get_category(k)
        if c == FieldCategory.image:
            out[k] = warp_affine(jnp.asarray(v), tr, new_size, oversample)
        else:
            out[k] = apply_affine2d(tr, k, jnp.asarray(v), c)
    if insert_backtransform:
        out["image_backtransform"] = tr.inv().tensor()
        out["image_original_size"] = jnp.asarray((W, H), jnp.int32)
    out.meta._imagesize = new_size
    return out


def sample_flip_rot90(key: jax.Array, batchshape, p_rot: float = 0.01):
    """Draw the discrete flip/rot90 choices: (do_flip bool, rot_dir in -1/0/+1).

    Split out from the transform construction so the gather-free warp can
    apply them as exact array permutations (`warp_fast.apply_fliprot`)."""
    k_flip, k_rot = jax.random.split(key)
    do_flip = jax.random.bernoulli(k_flip, 0.5, batchshape)
    rot_dir = jax.random.choice(
        k_rot,
        jnp.asarray([-1.0, 0.0, 1.0]),
        batchshape,
        p=jnp.asarray([p_rot / 2.0, 1.0 - p_rot, p_rot / 2.0]),
    )
    return do_flip, rot_dir


def flip_rot90_transform(do_flip: jax.Array, rot_dir: jax.Array, new_size: int) -> Affine2d:
    """Affine2d of `sample_flip_rot90` choices (flip applied first)."""
    batchshape = do_flip.shape
    w = h = float(new_size)
    tr_rot = (
        Affine2d.range_remap_2d([-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [w, h]).broadcast_to(batchshape)
        @ Affine2d.trs(angles=rot_dir * (math.pi * 0.5))
        @ Affine2d.range_remap_2d([0.0, 0.0], [w, h], [-1.0, -1.0], [1.0, 1.0]).broadcast_to(batchshape)
    )
    identity = Affine2d.identity().broadcast_to(batchshape)
    tr = Affine2d(jnp.where((rot_dir != 0.0)[..., None, None], tr_rot.tensor(), identity.tensor()))
    tr_flip = Affine2d.range_remap_2d([0.0, 0.0], [w, h], [w, 0.0], [0.0, h]).broadcast_to(batchshape)
    flip_or_id = Affine2d(
        jnp.where(do_flip[..., None, None], tr_flip.tensor(), identity.tensor())
    )
    return tr @ flip_or_id


def random_flip_rot90_transform(
    key: jax.Array, batchshape, new_size: int, p_rot: float = 0.01
) -> Affine2d:
    """Batched horizontal flip (p=0.5) + +-90 deg rotation (p=p_rot) transform.

    Contract: `geometric.py:234-267`. Unlike the reference (which mutates the
    image arrays with flips/transposes), this returns an Affine2d to be
    COMPOSED with the crop transform — axis-aligned so a single warp
    reproduces it exactly with no extra resampling.
    """
    do_flip, rot_dir = sample_flip_rot90(key, batchshape, p_rot)
    return flip_rot90_transform(do_flip, rot_dir, new_size)
