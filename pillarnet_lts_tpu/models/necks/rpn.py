"""Dense BEV FPN necks.

Structural parity with the reference (`det3d/models/necks/rpn.py:138-450`):

- RPNV1: conv5 -> block -> deconv x2 -> concat conv4 -> block; one output at
  stride 8 (`rpn.py:138-207`).
- RPNV2: conv4 -> block -> deconv x2 -> concat conv3 -> block; one output at
  stride 4 (`rpn.py:211-272`).
- RPNG: top-down 5 -> 4 -> 3; outputs at strides 8 and 4 (`rpn.py:276-355`).
- RPNGV2: same but with 3x3 'reduce' laterals (`rpn.py:359-450`).

All inputs are already dense masked maps (backbone output), so the
reference's `.dense()` conversion disappears. Norms here are plain BN2d
("BN" in reference norm_cfg) — statistics over every site.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..backbones.base import MaskedConv
from ..registry import NECKS
from ..utils.norm import MaskedBatchNorm

_XAVIER = nn.initializers.xavier_uniform()


class _ConvBNReLU(nn.Module):
    """3x3 conv + BN + ReLU. At eval the BN affine is FOLDED into the conv
    kernel (same scheme as the backbone, `backbones/base.py`), removing the
    per-conv normalization pass; with `quant=True` the folded conv runs the
    int8 deploy core (per-output-channel weights, per-tensor activations,
    absmax-calibrated — `runtime/quantize.py`). Parameter paths are
    unchanged from the original nn.Conv form ("Conv_0/kernel")."""

    features: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = MaskedConv(
            self.features, x.shape[-1], kernel_size=3, use_bias=False,
            dtype=self.dtype, kernel_init=_XAVIER, quant=self.quant,
            name="Conv_0",
        )
        bn = MaskedBatchNorm(self.features, dtype=self.dtype)
        if train:
            x = bn(conv(x), mask=None, train=True)
        else:
            inv, shift = bn.fold_factors()
            x = conv.folded(x, inv, shift)
        return nn.relu(x)


class _Block(nn.Module):
    """_build_layer (`rpn.py:172-185`): 1 + num_blocks conv+BN+ReLU units."""

    features: int
    num_blocks: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _ConvBNReLU(self.features, dtype=self.dtype, quant=self.quant,
                        name="conv0")(x, train)
        for i in range(self.num_blocks):
            x = _ConvBNReLU(self.features, dtype=self.dtype,
                            quant=self.quant, name=f"conv{i + 1}")(
                x, train
            )
        return x


class _DeBlock(nn.Module):
    """ConvTranspose2d(k=2, s=2) + BN + ReLU (`rpn.py:150-154`)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), use_bias=False,
            kernel_init=_XAVIER, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = MaskedBatchNorm(self.features, dtype=self.dtype)(
            x, mask=None, train=train
        )
        return nn.relu(x)


def _feat(x):
    """Accept (features, mask) pairs or bare arrays from the backbone dict."""
    return x[0] if isinstance(x, tuple) else x


@NECKS.register_module
class RPNV1(nn.Module):
    layer_nums: Sequence[int]
    num_filters: int
    in_channels: Sequence[int]
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = True):
        x4 = _feat(feats["conv4"])
        x5 = _feat(feats["conv5"])
        x = _Block(self.in_channels[0], self.layer_nums[0], dtype=self.dtype, quant=self.quant,
                   name="block_5")(x5, train)
        up = _DeBlock(self.in_channels[1], dtype=self.dtype, name="deblock_5")(
            x, train
        )
        x = jnp.concatenate([x4, up], axis=-1)
        x = _Block(self.num_filters, self.layer_nums[1], dtype=self.dtype, quant=self.quant,
                   name="block_4")(x, train)
        return (x,)


@NECKS.register_module
class RPNV2(nn.Module):
    layer_nums: Sequence[int]
    in_channels: Sequence[int]
    num_filters: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = True):
        x3 = _feat(feats["conv3"])
        x4 = _feat(feats["conv4"])
        x = _Block(self.in_channels[0], self.layer_nums[0], dtype=self.dtype, quant=self.quant,
                   name="block_4")(x4, train)
        up = _DeBlock(self.in_channels[1], dtype=self.dtype, name="deblock_4")(
            x, train
        )
        x = jnp.concatenate([x3, up], axis=-1)
        x = _Block(self.num_filters, self.layer_nums[1], dtype=self.dtype, quant=self.quant,
                   name="block_3")(x, train)
        return (x,)


@NECKS.register_module
class RPNG(nn.Module):
    layer_nums: Sequence[int]
    in_channels: Sequence[int]
    num_filters: Sequence[int]
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = True):
        x3 = _feat(feats["conv3"])
        x4 = _feat(feats["conv4"])
        x5 = _feat(feats["conv5"])
        # head stride 8
        x5b = _Block(self.in_channels[0], self.layer_nums[0], dtype=self.dtype, quant=self.quant,
                     name="block_5")(x5, train)
        up54 = _DeBlock(self.in_channels[1], dtype=self.dtype, name="top_down_54")(
            x5b, train
        )
        x4b = jnp.concatenate([x4, up54], axis=-1)
        x4b = _Block(self.num_filters[0], self.layer_nums[0], dtype=self.dtype, quant=self.quant,
                     name="block_4")(x4b, train)
        # head stride 4
        up43 = _DeBlock(self.in_channels[2], dtype=self.dtype, name="top_down_43")(
            x4b, train
        )
        x3b = jnp.concatenate([x3, up43], axis=-1)
        x3b = _Block(self.num_filters[1], self.layer_nums[1], dtype=self.dtype, quant=self.quant,
                     name="block_3")(x3b, train)
        return (x4b, x3b)


@NECKS.register_module
class RPNGV2(nn.Module):
    layer_nums: Sequence[int]
    in_channels: Sequence[int]
    num_filters: Sequence[int]
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = True):
        x3 = _feat(feats["conv3"])
        x4 = _feat(feats["conv4"])
        x5 = _feat(feats["conv5"])
        # head stride 8
        r4 = _ConvBNReLU(self.num_filters[0] // 2, dtype=self.dtype, quant=self.quant,
                         name="reduce_4")(x4, train)
        x5b = _Block(self.in_channels[0], self.layer_nums[0], dtype=self.dtype, quant=self.quant,
                     name="block_5")(x5, train)
        up54 = _DeBlock(self.num_filters[0] // 2, dtype=self.dtype,
                        name="top_down_54")(x5b, train)
        x4b = jnp.concatenate([r4, up54], axis=-1)
        x4b = _Block(self.num_filters[0], self.layer_nums[0], dtype=self.dtype, quant=self.quant,
                     name="block_4")(x4b, train)
        # head stride 4
        r3 = _ConvBNReLU(self.num_filters[1] // 2, dtype=self.dtype, quant=self.quant,
                         name="reduce_3")(x3, train)
        up43 = _DeBlock(self.num_filters[1] // 2, dtype=self.dtype,
                        name="top_down_43")(x4b, train)
        x3b = jnp.concatenate([r3, up43], axis=-1)
        x3b = _Block(self.num_filters[1], self.layer_nums[1], dtype=self.dtype, quant=self.quant,
                     name="block_3")(x3b, train)
        return (x4b, x3b)


@NECKS.register_module
class RPN(nn.Module):
    """Legacy generic multi-scale RPN (`det3d/models/necks/rpn.py:15-134`):
    N downsample stages (stride + conv blocks), upsampled/concatenated
    outputs. Kept for parity with the reference's retained legacy configs."""

    layer_nums: Sequence[int]
    ds_layer_strides: Sequence[int]
    ds_num_filters: Sequence[int]
    us_layer_strides: Sequence[int]
    us_num_filters: Sequence[int]
    in_channels: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if isinstance(x, dict):
            x = _feat(x[sorted(x.keys())[-1]])
        elif isinstance(x, tuple) and not hasattr(x, "shape"):
            x = _feat(x)

        up_start = len(self.layer_nums) - len(self.us_layer_strides)
        ups = []
        for i, n_blocks in enumerate(self.layer_nums):
            # strided entry conv + n_blocks convs
            feats = self.ds_num_filters[i]
            x = nn.Conv(
                feats, (3, 3), strides=(self.ds_layer_strides[i],) * 2,
                padding=((1, 1), (1, 1)), use_bias=False, kernel_init=_XAVIER,
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"block{i}_conv0",
            )(x)
            x = MaskedBatchNorm(feats, dtype=self.dtype,
                                name=f"block{i}_bn0")(x, None, train)
            x = nn.relu(x)
            for j in range(n_blocks):
                x = _ConvBNReLU(feats, dtype=self.dtype, quant=self.quant,
                                name=f"block{i}_conv{j + 1}")(x, train)
            if i - up_start >= 0:
                k = i - up_start
                stride = self.us_layer_strides[k]
                uf = self.us_num_filters[k]
                if stride > 1:
                    y = nn.ConvTranspose(
                        uf, (stride, stride), strides=(stride, stride),
                        use_bias=False, kernel_init=_XAVIER, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"deblock{k}",
                    )(x)
                else:
                    y = nn.Conv(
                        uf, (stride, stride), strides=(stride, stride),
                        use_bias=False, kernel_init=_XAVIER, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"deblock{k}",
                    )(x)
                y = MaskedBatchNorm(uf, dtype=self.dtype,
                                    name=f"deblock{k}_bn")(y, None, train)
                ups.append(nn.relu(y))
        if ups:
            x = jnp.concatenate(ups, axis=-1)
        return (x,)
