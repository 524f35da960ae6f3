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
