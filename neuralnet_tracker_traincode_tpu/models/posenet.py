"""The pose estimator network and its output heads (flax, NHWC).

Contract: `trackertraincode/neuralnets/models.py:96-393`. Forward returns a
dict with 'rot' (a RotationRepr pytree), 'coord', 'roi', 'unnormalized_quat' /
'unnormalized_6drepr', optional landmark/shape/uncertainty/face-detector
outputs, and (eval mode) 'pose' = quaternion.

Note: the reference's CnnNeck constructs a Dropout module but never applies it
in forward (`models.py:254-256`); we reproduce the actual behavior (no neck
dropout) and keep the config key for checkpoint compatibility.
"""

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.models import nll as NLL
from neuralnet_tracker_traincode_tpu.models.backbones.efficientnet import EfficientNetBackbone
from neuralnet_tracker_traincode_tpu.models.backbones.hybrid_vit import HybridVitBackbone
from neuralnet_tracker_traincode_tpu.models.backbones.mobilenet_v1 import MobileNet
from neuralnet_tracker_traincode_tpu.models.backbones.resnet import resnet18
from neuralnet_tracker_traincode_tpu.models.components import (
    DeformableHeadKeypoints,
    rigid_transformation_25d,
)
from neuralnet_tracker_traincode_tpu.ops import quaternion as Q
from neuralnet_tracker_traincode_tpu.ops.mathfn import inv_smoothclip0, smoothclip0
from neuralnet_tracker_traincode_tpu.ops.rotrepr import Mat33Repr, QuatRepr, RotationRepr


class DirectQuaternionWithNormalization(nn.Module):
    enable_uncertainty: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, Any]:
        # inv_smoothclip0(0.1) = log(0.1); bias the real part so the initial
        # rotation is near identity. Precomputed host-side (init fns are traced).
        import math as _math

        _bias_real = _math.log(0.1)

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            return b.at[Q.iw].set(_bias_real)

        z = nn.Dense(4, bias_init=bias_init, dtype=self.dtype, name="linear")(x)
        quats, quats_unnormalized = QuatRepr.from_features(z.astype(jnp.float32))
        out = {"unnormalized_quat": quats_unnormalized, "rot": quats}
        if self.enable_uncertainty:
            out["pose_scales_tril"] = NLL.FeaturesAsTriangularScale(3, name="uncertainty_net")(x)
        return out


class RotRepr6dWithNormalization(nn.Module):
    enable_uncertainty: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, Any]:
        def bias_init(key, shape, dtype=jnp.float32):
            return 0.001 * jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype)

        z = nn.Dense(6, bias_init=bias_init, dtype=self.dtype, name="linear")(x)
        z = z.astype(jnp.float32)
        out = {"unnormalized_6drepr": z, "rot": Mat33Repr.from_6drepr_features(z)}
        if self.enable_uncertainty:
            out["pose_scales_tril"] = NLL.FeaturesAsTriangularScale(3, name="uncertainty_net")(x)
        return out


class BoundingBox(nn.Module):
    enable_uncertainty: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, Any]:
        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.asarray([0.0, 0.0, 0.5, 0.5], dtype)

        z = nn.Dense(4, bias_init=bias_init, dtype=self.dtype, name="linear")(x)
        z = z.astype(jnp.float32)
        boxsize = smoothclip0(z[..., 2:])
        boxcenter = z[..., :2]
        out = {"roi": jnp.concatenate([boxcenter - boxsize, boxcenter + boxsize], axis=-1)}
        if self.enable_uncertainty:
            scales = NLL.DiagonalScaleParameter(4, name="uncertainty_scales")()
            out["roi_scales"] = jnp.broadcast_to(scales[None, :], z.shape)
        return out


class PositionSizeOutput(nn.Module):
    enable_uncertainty: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, Any]:
        xy = nn.Dense(2, dtype=self.dtype, name="linear_xy")(x).astype(jnp.float32)
        size = nn.Dense(
            1, bias_init=nn.initializers.constant(0.5), dtype=self.dtype, name="linear_size"
        )(x).astype(jnp.float32)
        out = {"coord": jnp.concatenate([xy, smoothclip0(size)], axis=-1)}
        if self.enable_uncertainty:
            out["coord_scales"] = NLL.FeaturesAsTriangularScale(3, name="uncertainty_scales")(x)
        return out


class Landmarks3dOutput(nn.Module):
    enable_uncertainty: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.deformablekeypoints = DeformableHeadKeypoints(40, 10)
        self.shapenet = nn.Dense(self.deformablekeypoints.num_eigvecs, dtype=self.dtype, name="shapenet")
        if self.enable_uncertainty:
            self.point_distrib_scales = NLL.DiagonalScaleParameter(68, name="uncertainty_points")
            self.shape_distrib_scales = NLL.DiagonalScaleParameter(50, name="uncertainty_shape")

    def __call__(self, z, quats: RotationRepr, coords) -> Dict[str, Any]:
        shapeparam = self.shapenet(z).astype(jnp.float32)
        pt3d_68 = rigid_transformation_25d(
            quats, coords[..., :2], coords[..., 2:], self.deformablekeypoints(shapeparam)
        )
        out = {"pt3d_68": pt3d_68, "shapeparam": shapeparam}
        if self.enable_uncertainty:
            out["pt3d_68_scales"] = jnp.broadcast_to(
                self.point_distrib_scales()[None, :, None], pt3d_68.shape
            )
            out["shapeparam_scales"] = jnp.broadcast_to(
                self.shape_distrib_scales()[None, :], shapeparam.shape
            )
        return out


class LocalToGlobalCoordinateOffset(nn.Module):
    """Learned per-dataset local->global pose offset (8 convention slots).

    Contract: `modelcomponents.py:136-184`. Parameter columns: the reference
    uses p[..., 1] both as the x-rotation angle and as part of the translation
    (p[..., 1:3]); p[..., 3] is the positive scale. Replicated faithfully.
    """

    num_parameter_sets: int = 1

    @nn.compact
    def __call__(self, quats: RotationRepr, coords, set_id):
        p = self.param("p", nn.initializers.zeros, (self.num_parameter_sets, 4))
        if set_id is None:
            psel = p[0:1]
        else:
            psel = p[set_id]
        rot_cls = type(quats)
        offset_quat = rot_cls.make_rotate_x(psel[..., 1])
        offset_transl = jnp.concatenate(
            [jnp.zeros(psel.shape[:-1] + (1,), psel.dtype), psel[..., 1:3]], axis=-1
        )
        offset_scale = smoothclip0(psel[..., 3])

        scale = coords[..., 2:]
        head_center_screenspace = coords[..., :2]
        scale = scale * offset_scale[..., None]
        pred_quat = quats.mult(offset_quat)
        pos_corr = quats.rotate_points(offset_transl[..., None, :])[..., 0, :]
        pos_corr = pos_corr[..., :2] * scale
        screen_pos = pos_corr + head_center_screenspace
        pred_pos = jnp.concatenate([screen_pos, scale], axis=-1)
        return pred_quat, pred_pos


def create_pose_estimator_backbone(num_heads: int, config: str, args: Dict[str, Any], dtype, name="convnet"):
    args = dict(args or {})
    if config == "mobilenetv1":
        return MobileNet(dtype=dtype, name=name, **args)
    if config == "resnet18":
        return resnet18(dtype=dtype, name=name, **args)
    if config == "hybrid_vit":
        if args:
            print(f"WARNING: backbone arguments to {config} ignored: {args}")
        return HybridVitBackbone(num_heads_out=num_heads, dtype=dtype, name=name)
    if config.startswith("efficientnet_"):
        kind = config[len("efficientnet_") :]
        assert kind in ("b0", "b1", "b2", "b3", "b4")
        args.pop("use_blurpool", None)
        return EfficientNetBackbone(
            kind=kind, stochastic_depth_prob=0.1, dtype=dtype, name=name, **args
        )
    raise ValueError(f"Unsupported backbone {config}")


class NetworkWithPointHead(nn.Module):
    """Pose network: grayscale crop -> backbone -> neck -> output heads."""

    NUM_DATASET_CONSTANTS = 8

    enable_point_head: bool = True
    enable_face_detector: bool = False
    config: str = "mobilenetv1"
    enable_uncertainty: bool = False
    dropout_prob: Optional[float] = None  # accepted for config compat; unused
    use_local_pose_offset: bool = True
    backbone_args: Optional[Dict[str, Any]] = None
    enable_6drot: bool = False
    dtype: Any = jnp.float32

    input_resolution: int = 129

    @property
    def num_heads(self) -> int:
        return 3 + (1 if self.enable_point_head else 0) + (1 if self.enable_face_detector else 0)

    @property
    def name_tag(self) -> str:
        return type(self).__name__ + "_" + self.config

    def get_config(self) -> Dict[str, Any]:
        return {
            "enable_point_head": self.enable_point_head,
            "enable_face_detector": self.enable_face_detector,
            "config": self.config,
            "enable_uncertainty": self.enable_uncertainty,
            "use_local_pose_offset": self.use_local_pose_offset,
            "backbone_args": dict(self.backbone_args or {}),
            "enable_6drot": self.enable_6drot,
        }

    @nn.compact
    def __call__(self, x, coord_convention_id=None, train: bool = False) -> Dict[str, Any]:
        assert x.shape[1] == x.shape[2] == self.input_resolution, f"Bad input shape {x.shape}"
        x = x.astype(self.dtype)
        features, _ = create_pose_estimator_backbone(
            self.num_heads, self.config, self.backbone_args, self.dtype
        )(x, train=train)

        if self.config == "hybrid_vit":
            # TransformerNeck: one query output per head.
            zs = [features[:, i, :] for i in range(self.num_heads)]
        else:
            # CnnNeck: shared pooled features for all heads (no dropout; see module doc).
            zs = [features for _ in range(self.num_heads)]

        out: Dict[str, Any] = BoundingBox(self.enable_uncertainty, self.dtype, name="boxnet")(zs.pop())
        out.update(PositionSizeOutput(self.enable_uncertainty, self.dtype, name="posnet")(zs.pop()))
        if self.enable_6drot:
            out.update(RotRepr6dWithNormalization(self.enable_uncertainty, self.dtype, name="quatnet")(zs.pop()))
        else:
            out.update(
                DirectQuaternionWithNormalization(self.enable_uncertainty, self.dtype, name="quatnet")(zs.pop())
            )

        rots, coords = out["rot"], out["coord"]
        if self.use_local_pose_offset:
            hidden_rot, hidden_coord = rots, coords
            rots_g, coords_g = LocalToGlobalCoordinateOffset(
                self.NUM_DATASET_CONSTANTS, name="local_pose_offset"
            )(hidden_rot, hidden_coord, coord_convention_id)
            out["rot"], out["coord"] = rots_g, coords_g
            if self.enable_point_head:
                rots_k, coords_k = LocalToGlobalCoordinateOffset(
                    self.NUM_DATASET_CONSTANTS, name="local_pose_offset_kpts"
                )(hidden_rot, hidden_coord, coord_convention_id)
                out.update(
                    Landmarks3dOutput(self.enable_uncertainty, self.dtype, name="landmarks")(
                        zs.pop(), rots_k, coords_k
                    )
                )
        elif self.enable_point_head:
            out.update(
                Landmarks3dOutput(self.enable_uncertainty, self.dtype, name="landmarks")(
                    zs.pop(), rots, coords
                )
            )

        if self.enable_face_detector:
            logits = nn.Dense(1, dtype=self.dtype, name="face_detector")(zs.pop()).astype(jnp.float32)
            logits = logits[..., 0]
            out["hasface_logits"] = logits
            out["hasface"] = jax.nn.sigmoid(logits)

        if not train:
            out["pose"] = out["rot"].as_quat()
        return out
