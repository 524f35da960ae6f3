"""Masked-dense building blocks with exact spconv semantics.

Re-expression of the reference sparse blocks
(`det3d/models/backbones/base.py:145-213`) for TPU:

- SubMConv2d ("submanifold"): output sites == input sites. With a masked-dense
  layout (inactive sites held at exactly 0) a plain dense conv already gives
  the SubM contribution sum — inactive inputs contribute 0 — as long as the
  result is re-zeroed at inactive sites before the next conv consumes it. The
  masked BatchNorm performs that re-zeroing.
- SparseConv2d (regular, strided): occupancy dilates. The new mask is a
  3x3/stride-2 max-pool of the old occupancy, exactly spconv's output-site
  rule for kernel 3, stride 2, padding 1.
- BatchNorm1d-over-features semantics = mask-weighted statistics
  (see `models/utils/norm.py`).

All convs run as dense NHWC convolutions so XLA tiles them onto the MXU; at
nuScenes 0.075 m the early stages are <10% occupied, but the MXU's dense
throughput beats gather/scatter sparse emulation for these channel widths.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..utils.norm import MaskedBatchNorm

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def dilate_mask(mask, stride: int = 2):
    """spconv SparseConv2d(k=3, stride, pad=1) output-site rule: a stride-s
    3x3 max-pool with SAME-style padding 1 over the occupancy."""
    m = mask.astype(jnp.float32)[..., None]
    out = nn.max_pool(
        m, window_shape=(3, 3), strides=(stride, stride), padding=((1, 1), (1, 1))
    )
    return out[..., 0] > 0.5


class MaskedConv(nn.Module):
    """3x3 (or kxk) conv over a masked-dense map; caller guarantees inactive
    sites are zero. Bias matches reference SubM blocks (bias=True when a norm
    follows — `base.py:120`, `:154`, `:192` set bias = norm_cfg is not None)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=_KAIMING,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Sparse2DBasicBlock(nn.Module):
    """Residual block of two SubM convs (`base.py:183-213`)."""

    planes: int
    momentum: float = 0.01
    eps: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        identity = x
        out = MaskedConv(self.planes, dtype=self.dtype, name="conv1")(x)
        out = MaskedBatchNorm(
            self.planes, self.momentum, self.eps, dtype=self.dtype, name="bn1"
        )(out, mask=mask, train=train)
        out = nn.relu(out)
        out = MaskedConv(self.planes, dtype=self.dtype, name="conv2")(out)
        out = MaskedBatchNorm(
            self.planes, self.momentum, self.eps, dtype=self.dtype, name="bn2"
        )(out, mask=mask, train=train)
        return nn.relu(out + identity)


class Sparse2DBasicBlockV(nn.Module):
    """Entry block: extra SubM conv + BN before the residual pair
    (`base.py:145-180`)."""

    planes: int
    momentum: float = 0.01
    eps: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        x = MaskedConv(self.planes, dtype=self.dtype, name="conv0")(x)
        x = MaskedBatchNorm(
            self.planes, self.momentum, self.eps, dtype=self.dtype, name="bn0"
        )(x, mask=mask, train=train)
        identity = x
        out = MaskedConv(self.planes, dtype=self.dtype, name="conv1")(x)
        out = MaskedBatchNorm(
            self.planes, self.momentum, self.eps, dtype=self.dtype, name="bn1"
        )(out, mask=mask, train=train)
        out = nn.relu(out)
        out = MaskedConv(self.planes, dtype=self.dtype, name="conv2")(out)
        out = MaskedBatchNorm(
            self.planes, self.momentum, self.eps, dtype=self.dtype, name="bn2"
        )(out, mask=mask, train=train)
        return nn.relu(out + identity)


class SparseDownStage(nn.Module):
    """Strided SparseConv2d + BN + ReLU followed by N residual blocks — one
    `convK` stage of the PillarResNets (`PillarResNet.py:86-108`)."""

    channels: int
    num_blocks: int
    stride: int = 2
    momentum: float = 0.01
    eps: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        new_mask = dilate_mask(mask, self.stride)
        y = MaskedConv(
            self.channels, stride=self.stride, use_bias=False,
            dtype=self.dtype, name="down_conv",
        )(x)
        y = MaskedBatchNorm(
            self.channels, self.momentum, self.eps, dtype=self.dtype,
            name="down_bn",
        )(y, mask=new_mask, train=train)
        y = nn.relu(y)
        for i in range(self.num_blocks):
            y = Sparse2DBasicBlock(
                self.channels, self.momentum, self.eps, dtype=self.dtype,
                name=f"block{i}",
            )(y, new_mask, train)
        return y, new_mask


class DenseConvBNReLU(nn.Module):
    """Dense conv + (unmasked) BN + ReLU (`base.py:100-108` post_act_block_dense
    and the conv5 stem, `PillarResNet.py:110-117`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    momentum: float = 0.01
    eps: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = MaskedConv(
            self.features, self.kernel_size, self.stride, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = MaskedBatchNorm(
            self.features, self.momentum, self.eps, dtype=self.dtype, name="bn"
        )(x, mask=None, train=train)
        return nn.relu(x)
