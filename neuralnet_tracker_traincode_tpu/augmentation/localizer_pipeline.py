"""Fused on-device augmentation for localizer training (224x288 crops).

The reference trains the localizer in the TrainLocalizer notebook (there is no
script; `readme.md:246-253`). This pipeline reproduces its data treatment with
the same device-side machinery as the pose pipeline: randomized context crops
around the face roi (wider context than the pose crops), aspect-corrected to
the 224x288 input, horizontal flips, intensity augs, and [-1, 1] roi labels.
"""

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.augmentation.affine import (
    apply_affine2d,
    transform_roi,
)
from neuralnet_tracker_traincode_tpu.augmentation.geometric import compute_view_roi
from neuralnet_tracker_traincode_tpu.augmentation.intensity import intensity_augmentation
from neuralnet_tracker_traincode_tpu.augmentation.warp import warp_affine
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d


class LocalizerAugConfig(NamedTuple):
    out_h: int = 224
    out_w: int = 288
    extension_factor: float = 2.2  # wide context around the face
    scale_jitter: float = 0.4
    enable_image_aug: bool = True
    deterministic: bool = False
    oversample: int = 1


def _aspect_corrected_roi(view_roi: jax.Array, aspect: float) -> jax.Array:
    """Expand the square view roi to the target aspect (w/h), centered."""
    x0, y0, x1, y1 = jnp.moveaxis(view_roi, -1, 0)
    w = x1 - x0
    h = y1 - y0
    target_w = jnp.maximum(w, h * aspect)
    target_h = target_w / aspect
    cx = 0.5 * (x0 + x1)
    cy = 0.5 * (y0 + y1)
    return jnp.stack(
        [cx - 0.5 * target_w, cy - 0.5 * target_h, cx + 0.5 * target_w, cy + 0.5 * target_h],
        axis=-1,
    )


def augment_batch_for_localizer(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, C) uint8 zero-padded
    labels: Dict[str, jax.Array],  # roi (B, 4), hasface (B,) float
    cfg: LocalizerAugConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    B = images.shape[0]
    k_scale, k_transl, k_flip, k_intensity = jax.random.split(key, 4)
    aspect = cfg.out_w / cfg.out_h

    roi = labels["roi"]
    if cfg.deterministic:
        scales = jnp.full((B,), cfg.extension_factor)
        translations = jnp.zeros((B, 2))
        do_flip = jnp.zeros((B,), bool)
    else:
        scales = (
            jnp.clip(jax.random.normal(k_scale, (B,)) * cfg.scale_jitter, -1.0, 2.0)
            + cfg.extension_factor
        )
        translations = jnp.clip(jax.random.normal(k_transl, (B, 2)) * 0.5, -1.0, 1.0)
        do_flip = jax.random.bernoulli(k_flip, 0.5, (B,))

    view_roi = compute_view_roi(roi, scales, translations, beyond_border_shift=0.3)
    view_roi = _aspect_corrected_roi(view_roi, aspect)
    tr = Affine2d.range_remap_2d(
        view_roi[..., :2],
        view_roi[..., 2:],
        jnp.zeros((B, 2), jnp.float32),
        jnp.broadcast_to(
            jnp.asarray([float(cfg.out_w), float(cfg.out_h)], jnp.float32), (B, 2)
        ),
    )
    flip = Affine2d.range_remap_2d(
        [0.0, 0.0], [float(cfg.out_w), float(cfg.out_h)],
        [float(cfg.out_w), 0.0], [0.0, float(cfg.out_h)],
    ).broadcast_to((B,))
    identity = Affine2d.identity().broadcast_to((B,))
    tr_flip = Affine2d(jnp.where(do_flip[:, None, None], flip.tensor(), identity.tensor()))
    tr = tr_flip @ tr

    warped = warp_affine(images, tr, (cfg.out_h, cfg.out_w), cfg.oversample)

    # Labels: roi to crop frame, then normalized to [-1, 1] per axis.
    roi_out = transform_roi(tr, roi)
    norm = Affine2d.range_remap_2d(
        [0.0, 0.0], [float(cfg.out_w), float(cfg.out_h)], [-1.0, -1.0], [1.0, 1.0]
    )
    roi_out = transform_roi(norm.broadcast_to((B,)), roi_out)
    out_labels = dict(labels)
    out_labels["roi"] = roi_out

    x = warped * (1.0 / 256.0)
    if cfg.enable_image_aug and not cfg.deterministic:
        x = intensity_augmentation(k_intensity, x)
    return x - 0.5, out_labels
