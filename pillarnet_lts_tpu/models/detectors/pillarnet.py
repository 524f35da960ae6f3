"""PillarNet single-stage detector.

Mirrors the reference composition (`det3d/models/detectors/pillarnet.py:7-82`
+ `single_stage.py:11-45`): reader -> backbone -> neck -> CenterHead. The
module is a pure function of (points, points_mask); loss/predict are
parameter-free methods of the head, exposed here for API parity (decorated
`nn.nowrap` — they construct helper dataclasses and must not be treated as
flax compute methods).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.utils import set_by_task_cfg
from .. import builder
from ..registry import DETECTORS


@DETECTORS.register_module
class PillarNet(nn.Module):
    reader: dict
    backbone: dict
    neck: dict
    bbox_head: dict
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32
    # BEV spatial parallelism (SURVEY §5.7): when set to a mesh axis name,
    # the BEV grid and every backbone stage output are constrained H-sharded
    # over that axis — XLA partitions the convs and inserts halo exchanges.
    # The caller must run apply under a mesh context defining the axis.
    spatial_axis: Optional[str] = None

    def setup(self):
        self.reader_net = builder.build_reader({**self.reader, "dtype": self.dtype})
        self.backbone_net = builder.build_backbone(
            {**self.backbone, "dtype": self.dtype}
        )
        self.neck_net = builder.build_neck({**self.neck, "dtype": self.dtype})
        self.head_net = builder.build_head({**self.bbox_head, "dtype": self.dtype})

    # ---- parameter-free helpers (plain python, not flax compute) -----------
    @nn.nowrap
    def get_head(self):
        """Plain CenterHeadMath for loss/predict — constructible anywhere,
        including inside another module's apply (no linen interception)."""
        from ..bbox_heads.center_head import CenterHeadMath

        cfg = dict(self.bbox_head)
        return CenterHeadMath(
            cfg["tasks"],
            cfg["code_weights"],
            cfg["common_heads"],
            cfg.get("reg_iou"),
            cfg.get("pillar_size", 0.1),
            cfg.get("point_cloud_range", (-75.2, -75.2, -2, 75.2, 75.2, 4)),
        )

    @nn.nowrap
    def get_num_classes(self):
        return self.get_head().num_classes

    @nn.nowrap
    def nms_post_maxsize(self):
        """NMS_POST_MAXSIZE (`pillarnet.py:19-22`)."""
        p = self.test_cfg["nms"]["nms_post_max_size"]
        return sum(p) if isinstance(p, (list, tuple)) else p

    @nn.nowrap
    def processed_test_cfg(self):
        cfg = dict(self.test_cfg)
        if cfg["nms"].get("use_multi_class_nms", False):
            cfg = set_by_task_cfg(cfg, self.get_num_classes())
        return cfg

    @nn.nowrap
    def loss(self, example, preds, train_cfg=None):
        return self.get_head().loss(example, preds, train_cfg or self.train_cfg)

    @nn.nowrap
    def predict(self, example, preds, test_cfg=None):
        return self.get_head().predict(
            example, preds, test_cfg or self.processed_test_cfg()
        )

    # ---- compute ------------------------------------------------------------
    def extract_feat(self, points, points_mask, train: bool):
        grid, occ = self.reader_net(points, points_mask, train)
        if self.spatial_axis:
            if occ is None:
                raise ValueError(
                    "spatial_axis sharding requires the dense reader path "
                    "(reader.compact_kmax=0); the compact row table has no "
                    "H axis to shard"
                )
            from ...parallel.spatial import pin_spatial

            grid = pin_spatial(grid, self.spatial_axis)
            occ = pin_spatial(occ, self.spatial_axis)
        feats = self.backbone_net(grid, occ, train)
        if self.spatial_axis:
            # pin only the stride-1/2 stages on the spatial axis — that is
            # where spatial parallelism pays (the huge maps). Deeper maps
            # (e.g. conv5 at H=90 on the 1440 grid) are often not divisible
            # by the axis size; pin them REPLICATED so GSPMD propagation of
            # the H-sharding stops instead of producing degenerate partial
            # shardings of tiny dims.
            pinned = {}
            for k, (x, msk) in feats.items():
                axis = self.spatial_axis if k in ("conv1", "conv2") else None
                if axis:
                    pinned[k] = (
                        pin_spatial(x, axis),
                        pin_spatial(msk, axis) if msk is not None else None,
                    )
                else:
                    rep = jax.lax.with_sharding_constraint
                    from jax.sharding import PartitionSpec as _P

                    pinned[k] = (
                        rep(x, _P()),
                        rep(msk, _P()) if msk is not None else None,
                    )
            feats = pinned
        bev = self.neck_net(feats, train)
        return bev, feats

    def __call__(self, points, points_mask, gt_boxes_and_cls=None,
                 train: bool = True):
        # gt_boxes_and_cls is accepted for signature parity with the
        # two-stage detector; the single-stage forward does not use it.
        bev, _ = self.extract_feat(points, points_mask, train)
        return self.head_net(bev, train)

    def forward_two_stage(self, points, points_mask, train: bool = True):
        """First-stage forward that also surfaces BEV + backbone features
        for the RCNN second stage (`pillarnet.py:51-82`). Box decoding /
        prediction happens outside apply (parameter-free)."""
        bev, feats = self.extract_feat(points, points_mask, train)
        preds = self.head_net(bev, train)
        return preds, bev, feats
