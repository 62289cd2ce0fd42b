"""Pure-JAX math kernels: quaternions, 6D rotations, 2D affine transforms."""

from neuralnet_tracker_traincode_tpu.ops import quaternion
from neuralnet_tracker_traincode_tpu.ops import rot6d
from neuralnet_tracker_traincode_tpu.ops import mathfn
from neuralnet_tracker_traincode_tpu.ops.affine2d import Affine2d, roi_normalizing_transform
from neuralnet_tracker_traincode_tpu.ops.rotrepr import QuatRepr, Mat33Repr, RotationRepr
