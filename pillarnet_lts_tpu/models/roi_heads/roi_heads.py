"""RoI refinement heads.

Ports of `det3d/models/roi_heads/roi_mix_head.py:17-123` (RoIMIXHead: optional
token mixer over the 49 grid tokens + shared FC + cls/reg branches) and
`roi_head.py:15-112` (RoIHead: flattened-feature MLP). The reference's 1x1
Conv1d stacks over (BxN, C, 1) tensors are plain Dense layers here; the
per-roi BatchNorm1d becomes BN over the flattened (B*N) rows — identical
statistics.
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import ROI_HEAD
from ..utils.norm import MaskedBatchNorm
from .mlp_layers import MLPMixer, ResMLPLayer

_XAVIER = nn.initializers.xavier_normal()
_FINAL_REG = nn.initializers.normal(stddev=0.001)


class _FCStack(nn.Module):
    """Dense + BN + ReLU stack (+ dropout), reference `make_fc_layers` /
    shared_fc_layer construction."""

    channels: Sequence[int]
    out_channels: Optional[int] = None  # final projection with bias
    dropout: float = 0.0
    dropout_after_first_only: bool = False
    dtype: Any = jnp.float32
    final_init: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for k, ch in enumerate(self.channels):
            x = nn.Dense(ch, use_bias=False, kernel_init=_XAVIER,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{k}")(x)
            x = MaskedBatchNorm(ch, dtype=self.dtype, name=f"bn{k}")(
                x, mask=None, train=train
            )
            x = nn.relu(x)
            drop_here = (
                (k == 0) if self.dropout_after_first_only
                else (k != len(self.channels) - 1)
            )
            if self.dropout > 0 and drop_here:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.out_channels is not None:
            x = nn.Dense(
                self.out_channels, use_bias=True,
                kernel_init=self.final_init or _XAVIER,
                dtype=self.dtype, param_dtype=jnp.float32, name="out",
            )(x)
        return x


@ROI_HEAD.register_module
class RoIMIXHead(nn.Module):
    in_channels: int
    model_cfg: dict
    num_class: int = 1
    code_size: int = 7
    add_box_param: bool = False
    test_cfg: Optional[dict] = None
    mixer_type: Optional[str] = None
    num_patches: int = 49
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_features, rois=None, roi_scores=None,
                 train: bool = True):
        """roi_features (B, R, num_patches * C) -> (rcnn_cls (B*R, ncls),
        rcnn_reg (B*R, code_size))."""
        B, R = roi_features.shape[:2]
        x = roi_features.reshape(B * R, self.num_patches, -1)

        if self.mixer_type == "MLPMixer":
            x = MLPMixer(self.in_channels, self.num_patches,
                         dtype=self.dtype, name="mixer")(x, train)
        elif self.mixer_type == "ResMLP":
            x = ResMLPLayer(self.in_channels, self.num_patches,
                            dtype=self.dtype, name="mixer")(x, train)

        x = x.reshape(B * R, -1)
        if self.add_box_param:
            x = jnp.concatenate(
                [x, rois.reshape(B * R, -1),
                 roi_scores.reshape(B * R, 1)], axis=-1,
            )

        cfg = dict(self.model_cfg)
        dp = cfg.get("DP_RATIO", 0.0)
        x = _FCStack(tuple(cfg["SHARED_FC"]), dropout=dp, dtype=self.dtype,
                     name="shared_fc")(x, train)
        rcnn_cls = _FCStack(
            tuple(cfg["CLS_FC"]), out_channels=self.num_class, dropout=dp,
            dropout_after_first_only=True, dtype=self.dtype, name="cls",
        )(x, train)
        rcnn_reg = _FCStack(
            tuple(cfg["REG_FC"]), out_channels=self.code_size, dropout=dp,
            dropout_after_first_only=True, dtype=self.dtype,
            final_init=_FINAL_REG, name="reg",
        )(x, train)
        return rcnn_cls, rcnn_reg


@ROI_HEAD.register_module
class RoIHead(nn.Module):
    """Flattened-feature MLP head (`roi_head.py:15-112`)."""

    input_channels: int
    model_cfg: dict
    num_class: int = 1
    code_size: int = 7
    add_box_param: bool = False
    test_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_features, rois=None, roi_scores=None,
                 train: bool = True):
        B, R = roi_features.shape[:2]
        x = roi_features.reshape(B * R, -1)
        if self.add_box_param:
            x = jnp.concatenate(
                [x, rois.reshape(B * R, -1),
                 roi_scores.reshape(B * R, 1)], axis=-1,
            )
        cfg = dict(self.model_cfg)
        dp = cfg.get("DP_RATIO", 0.0)
        x = _FCStack(tuple(cfg["SHARED_FC"]), dropout=dp, dtype=self.dtype,
                     name="shared_fc")(x, train)
        rcnn_cls = _FCStack(
            tuple(cfg["CLS_FC"]), out_channels=self.num_class, dropout=dp,
            dropout_after_first_only=True, dtype=self.dtype, name="cls",
        )(x, train)
        rcnn_reg = _FCStack(
            tuple(cfg["REG_FC"]), out_channels=self.code_size, dropout=dp,
            dropout_after_first_only=True, dtype=self.dtype,
            final_init=_FINAL_REG, name="reg",
        )(x, train)
        return rcnn_cls, rcnn_reg


class _LNMLP(nn.Module):
    """Linear + LayerNorm + ReLU stack (RoIFFNHead branch layers)."""

    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for k, ch in enumerate(self.channels):
            x = nn.Dense(ch, use_bias=True,
                         kernel_init=nn.initializers.xavier_uniform(),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{k}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{k}")(x)
            x = nn.relu(x)
        return x


@ROI_HEAD.register_module
class RoIFFNHead(nn.Module):
    """FFN-style refinement head (`det3d/models/roi_heads/roi_ffn_head.py:10-135`):
    residual feed-forward block + LN, separate LN-MLP branches for cls / reg
    (/ IoU), zero-initialized regression output, hm-style bias on cls."""

    model_cfg: dict
    num_cls_fcs: int = 1
    num_reg_fcs: int = 1
    num_iou_fcs: int = 1
    feedforward_channels: int = 2048
    content_dim: int = 256
    num_ffn_fcs: int = 2
    dropout: float = 0.0
    num_class: int = 1
    code_size: int = 7
    test_cfg: Optional[dict] = None
    init_bias: float = -2.19
    add_box_param: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_features, rois=None, roi_scores=None,
                 train: bool = True):
        B, R = roi_features.shape[:2]
        x = roi_features.reshape(B * R, -1)
        if self.add_box_param:
            x = jnp.concatenate(
                [x, rois.reshape(B * R, -1),
                 roi_scores.reshape(B * R, 1)], axis=-1,
            )

        # FFN (mmcv-style: num_ffn_fcs - 1 hidden expansions + residual)
        y = x
        for k in range(self.num_ffn_fcs - 1):
            y = nn.Dense(self.feedforward_channels, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"ffn_fc{k}")(y)
            y = nn.relu(y)
            if self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.content_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ffn_out")(y)
        if x.shape[-1] == self.content_dim:
            y = y + x
        query = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")(y)

        cls_feat = _LNMLP((self.content_dim,) * self.num_cls_fcs,
                          dtype=self.dtype, name="cls_fcs")(query)
        reg_feat = _LNMLP((self.content_dim,) * self.num_reg_fcs,
                          dtype=self.dtype, name="reg_fcs")(query)

        rcnn_cls = nn.Dense(
            self.num_class, bias_init=nn.initializers.constant(self.init_bias),
            dtype=self.dtype, param_dtype=jnp.float32, name="fc_cls",
        )(cls_feat)
        rcnn_reg = nn.Dense(
            self.code_size, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=jnp.float32, name="fc_reg",
        )(reg_feat)

        if self.num_iou_fcs > 0:
            iou_feat = _LNMLP((self.content_dim,) * self.num_iou_fcs,
                              dtype=self.dtype, name="iou_fcs")(query)
            rcnn_iou = nn.Dense(
                1, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=jnp.float32, name="fc_iou",
            )(iou_feat)
            return rcnn_cls, rcnn_reg, rcnn_iou
        return rcnn_cls, rcnn_reg
