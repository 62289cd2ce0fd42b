"""ResNet-18 backbone (flax, NHWC), 1-channel stem, optional BlurPool striding.

Contract: `trackertraincode/backbones/resnet.py:31-104` (torchvision resnet18
with a 1-channel 7x7 stem, zero-init residual BN, 512-d pooled output).
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.models.backbones.common import (
    BlurPool2D,
    global_avg_pool,
)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_blurpool: bool = False
    momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        identity = x
        y = x
        if self.use_blurpool:
            # Reference CustomBlock wraps conv1 in (BlurPool, conv3x3-stride-1)
            # for EVERY block — stride-1 blocks get a pure (non-downsampling)
            # blur too (`trackertraincode/backbones/resnet.py:31-50`).
            y = BlurPool2D(kernel_size=3, stride=self.stride, dtype=self.dtype, name="blurpool")(y)
            first_stride = 1
        else:
            first_stride = self.stride
        y = nn.Conv(
            self.planes,
            (3, 3),
            strides=(first_stride, first_stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="bn1"
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2"
        )(y)
        # Zero-init residual: the last BN's scale starts at 0 (torchvision
        # `zero_init_residual=True`).
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            dtype=self.dtype,
            scale_init=nn.initializers.zeros,
            name="bn2",
        )(y)
        if self.stride != 1 or inplanes != self.planes:
            identity = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                dtype=self.dtype,
                name="downsample_bn",
            )(identity)
        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    layers: Sequence[int] = (2, 2, 2, 2)
    use_blurpool: bool = False
    momentum: float = 0.9
    dtype: Any = jnp.float32
    return_intermediate: bool = False

    @property
    def num_features(self) -> int:
        return 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)
        if self.use_blurpool:
            x = BlurPool2D(kernel_size=3, stride=2, dtype=self.dtype, name="stem_blurpool")(x)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        intermediates = []
        planes = 64
        for stage, num_blocks in enumerate(self.layers):
            for b in range(num_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(
                    planes=planes,
                    stride=stride,
                    use_blurpool=self.use_blurpool,
                    momentum=self.momentum,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            intermediates.append(x)
            planes *= 2

        pooled = global_avg_pool(x)
        if self.return_intermediate:
            return pooled, intermediates
        return pooled, None


def resnet18(use_blurpool: bool = False, dtype=jnp.float32, **kwargs) -> ResNetBackbone:
    return ResNetBackbone(layers=(2, 2, 2, 2), use_blurpool=use_blurpool, dtype=dtype, **kwargs)
