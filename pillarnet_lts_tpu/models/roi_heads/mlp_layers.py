"""Token/channel mixing layers for RoI grid tokens.

Ports of `det3d/models/roi_heads/mlp_layers.py`: MLPMixer (`:24-61`) and
ResMLP (`:74-123`) blocks over (B, num_patches, C) RoI grid features.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class MLPMixer(nn.Module):
    in_channels: int
    num_patches: int
    expansion_factor: int = 4
    expansion_factor_token: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # token mixing: LN over channels, mix across patches
        inner = int(self.num_patches * self.expansion_factor)
        y = nn.LayerNorm(dtype=self.dtype, name="token_ln")(x)
        y = jnp.swapaxes(y, -1, -2)  # (B, C, N)
        y = nn.Dense(inner, dtype=self.dtype, param_dtype=jnp.float32,
                     name="token_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.num_patches, dtype=self.dtype,
                     param_dtype=jnp.float32, name="token_fc2")(y)
        y = jnp.swapaxes(y, -1, -2)
        x = x + y

        # channel mixing
        inner_c = int(self.in_channels * self.expansion_factor_token)
        y = nn.LayerNorm(dtype=self.dtype, name="channel_ln")(x)
        y = nn.Dense(inner_c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="channel_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.in_channels, dtype=self.dtype,
                     param_dtype=jnp.float32, name="channel_fc2")(y)
        return x + y


class Affine(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.dim))
        return alpha * x + beta


class ResMLPLayer(nn.Module):
    in_channels: int
    num_patches: int
    expansion_factor: int = 2
    layer_scale_init: float = 1e-4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        token_scale = self.param(
            "token_scale",
            nn.initializers.constant(self.layer_scale_init),
            (self.in_channels,),
        )
        channel_scale = self.param(
            "channel_scale",
            nn.initializers.constant(self.layer_scale_init),
            (self.in_channels,),
        )

        x = Affine(self.in_channels, name="token_aff")(x)
        y = jnp.swapaxes(x, -1, -2)
        y = nn.Dense(self.num_patches, dtype=self.dtype,
                     param_dtype=jnp.float32, name="token_fc")(y)
        y = jnp.swapaxes(y, -1, -2)
        x = x + token_scale * y

        x = Affine(self.in_channels, name="channel_aff")(x)
        y = nn.Dense(self.in_channels * self.expansion_factor,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="channel_fc1")(x)
        y = nn.gelu(y)
        y = nn.Dense(self.in_channels, dtype=self.dtype,
                     param_dtype=jnp.float32, name="channel_fc2")(y)
        x = x + channel_scale * y

        return Affine(self.in_channels, name="post_aff")(x)
