"""Auxiliary per-grid-point foreground classification head.

Port of `PointHead` (`det3d/models/point_heads/point_head_simple.py:14-99`)
+ the 2D stacked-target assignment and sigmoid-focal classification loss
from `point_head_template.py:141-198`. Targets: a grid point is foreground
iff it falls inside its RoI's assigned gt box footprint (2D rotated test).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import POINT_HEAD
from ..utils.norm import MaskedBatchNorm


@POINT_HEAD.register_module
class PointHead(nn.Module):
    in_channels: int
    num_class: int
    model_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, point_features, train: bool = True):
        """point_features (B, R, G, C) -> logits (B, R, G, 1) + sigmoid scores."""
        cfg = dict(self.model_cfg)
        x = point_features
        for k, ch in enumerate(cfg["CLS_FC"]):
            x = nn.Dense(ch, use_bias=False,
                         kernel_init=nn.initializers.xavier_normal(),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"cls_fc{k}")(x)
            x = MaskedBatchNorm(ch, dtype=self.dtype, name=f"cls_bn{k}")(
                x, mask=None, train=train
            )
            x = nn.relu(x)
        logits = nn.Dense(1, use_bias=True, dtype=self.dtype,
                          param_dtype=jnp.float32, name="cls_out")(x)
        return logits


def assign_point_targets_2d(point_coords, gt_of_rois_src):
    """(B, R, G, 2) grid points vs (B, R, code+1) per-roi gt boxes ->
    fg labels (B, R, G) (2D rotated-footprint test,
    `point_head_template.py:141-172`)."""
    gt = gt_of_rois_src
    rel = point_coords - gt[..., None, 0:2]
    ang = gt[..., 6]
    c = jnp.cos(ang)[..., None]
    s = jnp.sin(ang)[..., None]
    lx = rel[..., 0] * c + rel[..., 1] * s
    ly = -rel[..., 0] * s + rel[..., 1] * c
    half_w = gt[..., 3][..., None] * 0.5
    half_l = gt[..., 4][..., None] * 0.5
    valid_gt = (jnp.abs(gt[..., :6]).sum(-1) > 0)[..., None]
    inside = (jnp.abs(lx) <= half_w) & (jnp.abs(ly) <= half_l) & valid_gt
    return inside.astype(jnp.float32)


def point_cls_loss(logits, labels, weight=1.0, alpha=0.25, gamma=2.0):
    """Sigmoid focal classification loss, pos-count normalized
    (`point_head_template.py:174-198`)."""
    logits = logits.reshape(-1)
    labels = labels.reshape(-1)
    positives = labels > 0
    cls_weights = jnp.where(positives, 1.0, 1.0)
    pos_normalizer = jnp.maximum(positives.sum().astype(jnp.float32), 1.0)
    cls_weights = cls_weights / pos_normalizer

    p = jax.nn.sigmoid(logits)
    targets = labels
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - p) + (1 - targets) * p
    focal = alpha_w * jnp.power(pt, gamma)
    bce = jnp.clip(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    loss = (focal * bce * cls_weights).sum()
    return loss * weight
