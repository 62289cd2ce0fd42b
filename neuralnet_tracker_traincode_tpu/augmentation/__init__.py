"""Data augmentation: affine label transforms, geometric + intensity image augs.

All ops are pure jnp and jit-compatible; the training pipeline fuses them into
a single device program (unlike the reference, which runs cv2/kornia on CPU
workers: `trackertraincode/datatransformation/`).
"""

from neuralnet_tracker_traincode_tpu.augmentation.affine import (
    apply_affine2d,
    position_normalization,
    position_unnormalization,
    transform_coord,
    transform_keypoints,
    transform_points,
    transform_roi,
    transform_rot,
)
from neuralnet_tracker_traincode_tpu.augmentation.normalization import (
    normalize_batch,
    offset_points_by_half_pixel,
    unnormalize_batch,
    whiten_batch,
    whiten_image,
    unwhiten_image,
)
