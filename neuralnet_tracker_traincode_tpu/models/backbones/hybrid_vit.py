"""Hybrid CNN/Transformer backbone (flax, NHWC).

Contract: `trackertraincode/backbones/hybrid_vit.py`: ResNet18 front
(7x7 stride-2 stem straight into layer1..layer4, no maxpool), 1x1 projection
to 248 channels + 8 learned positional channels, cls token, and a 1+1 layer
post-LN transformer (d=256, 8 heads, ffn 512, dropout 0.1) decoding one
learned query per prediction head. Output shape (B, num_heads, 256).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from neuralnet_tracker_traincode_tpu.models.backbones.resnet import BasicBlock


class _EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_ff: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype, dropout_rate=self.dropout, name="self_attn"
        )(x, x, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + nn.Dropout(self.dropout)(att, deterministic=not train))
        ff = nn.Dense(self.dim_ff, dtype=self.dtype, name="linear1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=not train)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + nn.Dropout(self.dropout)(ff, deterministic=not train))
        return x


class _DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_ff: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, train: bool = False):
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype, dropout_rate=self.dropout, name="self_attn"
        )(tgt, tgt, deterministic=not train)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            tgt + nn.Dropout(self.dropout)(att, deterministic=not train)
        )
        cross = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype, dropout_rate=self.dropout, name="cross_attn"
        )(tgt, memory, deterministic=not train)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            tgt + nn.Dropout(self.dropout)(cross, deterministic=not train)
        )
        ff = nn.Dense(self.dim_ff, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=not train)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(
            tgt + nn.Dropout(self.dropout)(ff, deterministic=not train)
        )
        return tgt


class HybridVitBackbone(nn.Module):
    num_heads_out: int = 4  # number of learned queries (one per prediction head)
    transformer_dim: int = 256
    position_enc_dim: int = 8
    nhead: int = 8
    dropout: float = 0.1
    momentum: float = 0.9
    dtype: Any = jnp.float32

    @property
    def num_features(self) -> int:
        return self.transformer_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ResNet18 front: stem conv straight into the residual stages (no maxpool).
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, name="stem",
        )(x)
        planes = 64
        for stage in range(4):
            for b in range(2):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(
                    planes=planes, stride=stride, momentum=self.momentum, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            planes *= 2

        # Projection + learned positional channels.
        z = nn.Conv(
            self.transformer_dim - self.position_enc_dim, (1, 1), use_bias=False,
            dtype=self.dtype, name="proj_conv",
        )(x)
        z = nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum, dtype=self.dtype, name="proj_bn"
        )(z)
        B, H, W, C = z.shape
        position = self.param(
            "position", nn.initializers.normal(1.0), (1, H, W, self.position_enc_dim)
        )
        z = jnp.concatenate([z, jnp.broadcast_to(position, (B, H, W, self.position_enc_dim))], axis=-1)
        z = z.reshape(B, H * W, self.transformer_dim)
        cls_token = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.transformer_dim))
        z = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, self.transformer_dim)), z], axis=-2)

        queries = self.param(
            "queries", nn.initializers.normal(1.0), (1, self.num_heads_out, self.transformer_dim)
        )
        memory = _EncoderLayer(
            self.transformer_dim, self.nhead, 2 * self.transformer_dim, self.dropout,
            dtype=self.dtype, name="transformer_encoder",
        )(z, train)
        memory = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="transformer_encoder_norm")(memory)
        out = _DecoderLayer(
            self.transformer_dim, self.nhead, 2 * self.transformer_dim, self.dropout,
            dtype=self.dtype, name="transformer_decoder",
        )(jnp.broadcast_to(queries, (B, self.num_heads_out, self.transformer_dim)), memory, train)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="transformer_decoder_norm")(out)
        return out, None
