"""EfficientNet-V1 backbone (flax, NHWC): b0..b4 variants, 1->3 channel adapter.

Contract: `trackertraincode/backbones/efficientnet.py` (torchvision
efficientnet_{b0,b3,b4} with a 1x1 input adapter initialized to broadcast the
grayscale channel, intermediate feature taps, mean-pooled output).
"""

import math
from typing import Any, List, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.models.backbones.common import global_avg_pool


class MBConvConfig(NamedTuple):
    expand_ratio: int
    kernel: int
    stride: int
    in_ch: int
    out_ch: int
    num_layers: int


_BASE_SETTINGS = [
    MBConvConfig(1, 3, 1, 32, 16, 1),
    MBConvConfig(6, 3, 2, 16, 24, 2),
    MBConvConfig(6, 5, 2, 24, 40, 2),
    MBConvConfig(6, 3, 2, 40, 80, 3),
    MBConvConfig(6, 5, 1, 80, 112, 3),
    MBConvConfig(6, 5, 2, 112, 192, 4),
    MBConvConfig(6, 3, 1, 192, 320, 1),
]

_SCALING = {  # (width_mult, depth_mult, head_features)
    "b0": (1.0, 1.0, 1280),
    "b1": (1.0, 1.1, 1280),
    "b2": (1.1, 1.2, 1408),
    "b3": (1.2, 1.4, 1536),
    "b4": (1.4, 1.8, 1792),
}


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def scaled_settings(kind: str) -> Tuple[List[MBConvConfig], int]:
    width_mult, depth_mult, head = _SCALING[kind]
    out = []
    for cfg in _BASE_SETTINGS:
        out.append(
            MBConvConfig(
                cfg.expand_ratio,
                cfg.kernel,
                cfg.stride,
                _make_divisible(cfg.in_ch * width_mult),
                _make_divisible(cfg.out_ch * width_mult),
                int(math.ceil(cfg.num_layers * depth_mult)),
            )
        )
    return out, head


class SqueezeExcite(nn.Module):
    squeeze_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(C, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    expand_ratio: int
    kernel: int
    stride: int
    out_ch: int
    sd_prob: float = 0.0  # stochastic depth drop probability
    momentum: float = 0.99
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        use_res = self.stride == 1 and in_ch == self.out_ch
        h = x
        expanded = in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            h = nn.Conv(expanded, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(h)
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                name="expand_bn",
            )(h)
            h = nn.silu(h)
        pad = self.kernel // 2
        h = nn.Conv(
            expanded,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=expanded,
            use_bias=False,
            dtype=self.dtype,
            name="dw_conv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="dw_bn",
        )(h)
        h = nn.silu(h)
        h = SqueezeExcite(max(1, in_ch // 4), dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(h)
        h = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="project_bn",
        )(h)
        if use_res:
            if train and self.sd_prob > 0.0:
                keep = 1.0 - self.sd_prob
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (h.shape[0], 1, 1, 1))
                h = h * mask / keep
            h = h + x
        return h


class EfficientNetBackbone(nn.Module):
    """Returns (mean-pooled features, 5 intermediate maps at /2 /4 /8 /16 /32)."""

    kind: str = "b0"
    stochastic_depth_prob: float = 0.1
    momentum: float = 0.99
    dtype: Any = jnp.float32

    @property
    def num_features(self) -> int:
        return _SCALING[self.kind][2]

    @property
    def num_intermediate_features(self) -> List[int]:
        settings, _ = scaled_settings(self.kind)
        return [settings[i].out_ch for i in (0, 1, 2, 4, 6)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        settings, head_features = scaled_settings(self.kind)
        # 1->3 channel adapter, initialized to broadcast grayscale (ones + zero bias).
        x = nn.Conv(
            3,
            (1, 1),
            kernel_init=nn.initializers.ones,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="to_3chn_input",
        )(x)
        x = nn.Conv(
            settings[0].in_ch,
            (3, 3),
            strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            name="stem_bn",
        )(x)
        x = nn.silu(x)

        total_blocks = sum(c.num_layers for c in settings)
        block_id = 0
        taps = {}
        for stage_idx, cfg in enumerate(settings):
            for layer_idx in range(cfg.num_layers):
                stride = cfg.stride if layer_idx == 0 else 1
                sd_prob = self.stochastic_depth_prob * block_id / total_blocks
                x = MBConv(
                    expand_ratio=cfg.expand_ratio,
                    kernel=cfg.kernel,
                    stride=stride,
                    out_ch=cfg.out_ch,
                    sd_prob=sd_prob,
                    momentum=self.momentum,
                    dtype=self.dtype,
                    name=f"stage{stage_idx + 1}_{layer_idx}",
                )(x, train)
                block_id += 1
            taps[stage_idx] = x
        # Intermediate taps match the reference's forward hooks on layers 1,2,3,5,7.
        intermediates = [taps[i] for i in (0, 1, 2, 4, 6)]

        x = nn.Conv(head_features, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            name="head_bn",
        )(x)
        x = nn.silu(x)
        return global_avg_pool(x), intermediates
