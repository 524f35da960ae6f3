"""Compact (gather-based) execution of the sparse ResNet blocks.

Runs the SAME flax modules (`Sparse2DBasicBlock[V]`, `SparseDownStage`) —
same parameter tree, same BN statistics semantics — over the compact
active-site row representation from `ops/compact.py` instead of the
masked-dense BEV grid. This is the TPU recast of spconv's actual execution
model (`det3d/ops/pillar_ops` rulebook + gather/GEMM/scatter): at realistic
2-8% occupancy the early stages do 5-13x less MXU work than dense.

All helpers are batched: rows (B, K, C), nbr (B, Kout, 9), valid (B, Kout).
Padding rows are kept at exactly 0 (masked BN re-zeroes in training; the
valid-mask multiply re-zeroes in eval), so gathers from the zero sentinel
row and residual adds stay exact.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


@struct.dataclass
class CompactPillars:
    """Active-site row table, sorted row-major by flat BEV id.

    rows: (B, kmax, C) features; padding rows are 0.
    site_ids: (B, kmax) int32 flat ids (y * width + x); padding = H * W.
    k_valid: (B,) int32 active-site counts (clamped to kmax).
    height/width: static grid geometry.
    """

    rows: Any
    site_ids: Any
    k_valid: Any
    height: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False)


def _ext(rows):
    """Append the zero sentinel row: (B, K, C) -> (B, K + 1, C)."""
    return jnp.pad(rows, ((0, 0), (0, 1), (0, 0)))


def _gather_matmul(rows, nbr, weight, bias=None):
    """Batched im2col gather + matmul: (B,K+1,Cin),(B,Ko,9) -> (B,Ko,Cout)."""
    b, ko, _ = nbr.shape
    cin = rows.shape[-1]
    g = jnp.take_along_axis(
        rows[:, :, None, :], nbr[..., None], axis=1
    )  # (B, Ko, 9, Cin)
    y = g.reshape(b, ko, 9 * cin) @ weight
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_bn_act_compact(conv, bn, rows, nbr, valid, train, act=True):
    """conv -> BN(rows, valid) -> optional ReLU on compact rows, with the BN
    affine folded into the gather-conv weights at inference (mirror of
    `base.py::conv_bn_act`)."""
    cin = conv.kernel.shape[2]
    cout = conv.features
    if train:
        w = conv.kernel.reshape(9 * cin, cout)
        b = conv.bias if conv.use_bias else None
        y = _gather_matmul(
            _ext(rows).astype(conv.dtype), nbr, w.astype(conv.dtype), b
        )
        y = bn(y, mask=valid, train=True)
    else:
        inv, shift = bn.fold_factors()
        w = (conv.kernel * inv).reshape(9 * cin, cout)
        b = conv.bias * inv + shift if conv.use_bias else shift
        y = _gather_matmul(
            _ext(rows).astype(conv.dtype), nbr, w.astype(conv.dtype), b
        )
        y = y * valid.astype(y.dtype)[..., None]
    return nn.relu(y) if act else y


def basic_block_compact(block, rows, nbr, valid, train):
    """`Sparse2DBasicBlock.__call__` over compact rows."""
    identity = rows
    out = conv_bn_act_compact(block.conv1, block.bn1, rows, nbr, valid, train)
    out = conv_bn_act_compact(
        block.conv2, block.bn2, out, nbr, valid, train, act=False
    )
    return nn.relu(out + identity)


def basic_block_v_compact(block, rows, nbr, valid, train):
    """`Sparse2DBasicBlockV.__call__` over compact rows."""
    x = conv_bn_act_compact(
        block.conv0, block.bn0, rows, nbr, valid, train, act=False
    )
    identity = x
    out = conv_bn_act_compact(block.conv1, block.bn1, x, nbr, valid, train)
    out = conv_bn_act_compact(
        block.conv2, block.bn2, out, nbr, valid, train, act=False
    )
    return nn.relu(out + identity)


def down_stage_compact(stage, rows_fine, nbr_down, nbr_coarse, valid_coarse,
                       train):
    """`SparseDownStage.__call__` over compact rows: strided gather-conv from
    the fine row table, then the stage's residual blocks at the coarse level."""
    y = conv_bn_act_compact(
        stage.down_conv, stage.down_bn, rows_fine, nbr_down, valid_coarse,
        train,
    )
    for blk in stage.blocks:
        y = basic_block_compact(blk, y, nbr_coarse, valid_coarse, train)
    return y
