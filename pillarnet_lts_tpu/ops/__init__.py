from .iou3d import (
    to_pcdet_bev,
    box_corners_bev,
    rotated_overlap_bev,
    rotated_iou_bev,
    boxes_iou3d,
    boxes_aligned_iou3d,
    boxes_aligned_overlap_bev,
)
from .nms import rotated_nms, circle_nms
from .voxelize import PillarSpec, voxelize_points, scatter_max_to_grid
from .bilinear import bilinear_interpolate
from .point_in_box import points_in_rbbox_device
from .roiaware_pool import (
    roiaware_pool3d,
    points_in_boxes_index,
    points_in_boxes_batch,
)

__all__ = [
    "to_pcdet_bev",
    "box_corners_bev",
    "rotated_overlap_bev",
    "rotated_iou_bev",
    "boxes_iou3d",
    "boxes_aligned_iou3d",
    "boxes_aligned_overlap_bev",
    "rotated_nms",
    "circle_nms",
    "PillarSpec",
    "voxelize_points",
    "scatter_max_to_grid",
    "bilinear_interpolate",
    "points_in_rbbox_device",
    "roiaware_pool3d",
    "points_in_boxes_index",
    "points_in_boxes_batch",
]
