"""MobileNet v1 backbone (flax, NHWC) — the default pose-estimator backbone.

Contract: `trackertraincode/backbones/mobilenet_v1.py:36-189`: 5x5 stride-2
stem, 13 depthwise-separable blocks, optional BlurPool anti-aliased striding,
width multiplier; returns (pooled 1024-d features, 5 intermediate maps).
"""

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.models.backbones.common import (
    BlurPool2D,
    global_avg_pool,
)


class DepthWiseBlock(nn.Module):
    planes: int
    stride: int = 1
    use_blurpool: bool = True
    momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        residual = x
        if self.stride == 2 and self.use_blurpool:
            x = BlurPool2D(kernel_size=3, stride=2, dtype=self.dtype, name="blurpool")(x)
            stride = 1
        else:
            stride = self.stride
        x = nn.Conv(
            inplanes,
            (3, 3),
            strides=(stride, stride),
            padding=[(1, 1), (1, 1)],
            feature_group_count=inplanes,
            use_bias=False,
            dtype=self.dtype,
            name="conv_dw",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="bn_dw"
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv_sep"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="bn_sep"
        )(x)
        if self.stride == 1 and inplanes == self.planes:
            x = x + residual
        return nn.relu(x)


class MobileNet(nn.Module):
    """Returns (features (B, 1024*w), intermediate maps at /2 /4 /8 /16 /32)."""

    widen_factor: float = 1.0
    use_blurpool: bool = False
    momentum: float = 0.9
    dtype: Any = jnp.float32

    @property
    def num_features(self) -> int:
        return int(1024 * self.widen_factor)

    @property
    def num_intermediate_features(self) -> List[int]:
        return [int(c * self.widen_factor) for c in (64, 128, 256, 512, 1024)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.widen_factor

        def block(planes, stride=1, name=None):
            return DepthWiseBlock(
                planes=int(planes * w),
                stride=stride,
                use_blurpool=self.use_blurpool,
                momentum=self.momentum,
                dtype=self.dtype,
                name=name,
            )

        x = nn.Conv(
            int(32 * w),
            (5, 5),
            strides=(2, 2),
            padding=[(2, 2), (2, 2)],
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)

        out1 = x = block(64, name="dw2_1")(x, train)
        x = block(128, stride=2, name="dw2_2")(x, train)
        out2 = x = block(128, name="dw3_1")(x, train)
        x = block(256, stride=2, name="dw3_2")(x, train)
        out3 = x = block(256, name="dw4_1")(x, train)
        x = block(512, stride=2, name="dw4_2")(x, train)
        x = block(512, name="dw5_1")(x, train)
        x = block(512, name="dw5_2")(x, train)
        x = block(512, name="dw5_3")(x, train)
        x = block(512, name="dw5_4")(x, train)
        out4 = x = block(512, name="dw5_5")(x, train)
        x = block(1024, stride=2, name="dw5_6")(x, train)
        out5 = x = block(1024, name="dw6")(x, train)

        pooled = global_avg_pool(x)
        return pooled, [out1, out2, out3, out4, out5]
