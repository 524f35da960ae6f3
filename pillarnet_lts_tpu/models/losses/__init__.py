from .centernet_loss import (
    fast_focal_loss,
    reg_loss,
    iou_loss,
    iou_reg_loss,
    bbox3d_overlaps_iou,
    bbox3d_overlaps_giou,
    bbox3d_overlaps_diou,
    gather_feat,
)

__all__ = [
    "fast_focal_loss",
    "reg_loss",
    "iou_loss",
    "iou_reg_loss",
    "bbox3d_overlaps_iou",
    "bbox3d_overlaps_giou",
    "bbox3d_overlaps_diou",
    "gather_feat",
]
