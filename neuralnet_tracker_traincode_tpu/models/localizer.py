"""Face localizer network (flax, NHWC).

Contract: `trackertraincode/neuralnets/models.py:30-93`: 1x224x288 input ->
MNASNet-style inverted-residual stack -> 2-channel map. Channel 0 averages to
the face logit; channel 1 is softmaxed into an attention map from which a
soft-argmax center +- std yields the bbox. Output: (B, 5) = [logit, x0, y0, x1, y1].
"""

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.models.components import center_of_mass_and_std


class InvertedResidual(nn.Module):
    """MNASNet inverted residual block (expansion -> depthwise -> project)."""

    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    expansion_factor: int = 2
    momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion_factor
        apply_residual = self.stride == 1 and in_ch == self.out_ch
        pad = self.kernel_size // 2
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            mid,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=mid,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="bn3")(h)
        if apply_residual:
            h = h + x
        return h


class LocalizerNet(nn.Module):
    momentum: float = 0.9
    dtype: Any = jnp.float32

    input_resolution = (224, 288)  # H x W

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        assert x.shape[1] == 224 and x.shape[2] == 288, f"Bad input {x.shape}"
        x = x.astype(self.dtype)

        # Initial stage: 3x3 stride-2 conv.
        x = nn.Conv(
            8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="initial_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="initial_bn")(x)
        x = nn.relu(x)

        # Depthwise-separable conv (BN momentum 0.001 torch = 0.999 flax).
        x = nn.Conv(
            8, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=8, use_bias=False,
            dtype=self.dtype, name="dsconv_dw",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.999, dtype=self.dtype, name="dsconv_bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(8, (1, 1), use_bias=False, dtype=self.dtype, name="dsconv_pw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.999, dtype=self.dtype, name="dsconv_bn2")(x)

        ir_cfg = [
            (12, 3, 2, 2), (12, 3, 1, 2),
            (20, 3, 2, 4), (20, 3, 1, 4), (20, 3, 1, 4),
            (32, 5, 2, 2), (32, 5, 1, 2), (32, 3, 1, 2), (32, 3, 1, 2),
            (56, 3, 2, 2), (56, 3, 1, 2), (56, 3, 1, 2),
        ]
        for i, (out_ch, k, s, e) in enumerate(ir_cfg):
            x = InvertedResidual(
                out_ch, k, s, e, momentum=self.momentum, dtype=self.dtype, name=f"ir{i}"
            )(x, train)
        x = nn.Conv(2, (1, 1), use_bias=True, dtype=self.dtype, name="final_conv")(x)
        x = x.astype(jnp.float32)

        logit = jnp.mean(x[..., 0], axis=(1, 2))
        attn = x[..., 1]
        B, H, W = attn.shape
        attn = jax.nn.softmax(attn.reshape(B, -1), axis=1).reshape(B, H, W)
        half_size = self.param("boxstddev_half_size", nn.initializers.constant(1.5), ())
        mean, std = center_of_mass_and_std(attn, half_size)
        pred = jnp.concatenate([logit[:, None], mean - std, mean + std], axis=-1)
        return pred

    @staticmethod
    def inference_outputs(pred: jax.Array) -> Dict[str, jax.Array]:
        return {"hasface": jax.nn.sigmoid(pred[:, 0]), "roi": pred[:, 1:]}

    def get_config(self) -> Dict[str, Any]:
        return {}
