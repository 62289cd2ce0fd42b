"""Shared backbone building blocks (flax, NHWC).

BlurPool contract: `trackertraincode/neuralnets/modelcomponents.py:187-205`
(anti-aliased downsampling with a normalized Pascal kernel; kornia's
`_blur_pool_by_kernel2d` does a depthwise conv with ZERO padding (k-1)//2).
"""

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neuralnet_tracker_traincode_tpu.models.components import pascal_kernel_2d

Dtype = Any


class BlurPool2D(nn.Module):
    """Blur (anti-alias) then downsample. Fixed binomial kernel, not trainable."""

    kernel_size: int = 3
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        C = x.shape[-1]
        k = pascal_kernel_2d(self.kernel_size)  # (k, k)
        kernel = jnp.asarray(k, self.dtype)[:, :, None, None]  # (k, k, 1, 1)
        kernel = jnp.tile(kernel, (1, 1, 1, C))  # depthwise (k, k, 1, C)
        pad = (self.kernel_size - 1) // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )


class ConvBN(nn.Module):
    """Conv -> BatchNorm (-> optional activation)."""

    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    momentum: float = 0.9  # flax convention: running = m * running + (1 - m) * new
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32
    padding: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding if self.padding is not None else self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad if isinstance(pad, str) else [(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def global_avg_pool(x):
    """(B, H, W, C) -> (B, C)"""
    return jnp.mean(x, axis=(1, 2))
