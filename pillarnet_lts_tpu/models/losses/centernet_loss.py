"""CenterNet-style detection losses as pure jnp functions.

Functional parity with the reference modules
(`det3d/models/losses/centernet_loss.py`):

- ``fast_focal_loss``  <-> FastFocalLoss (`centernet_loss.py:34-63`)
- ``reg_loss``         <-> RegLoss (`centernet_loss.py:9-31`), returns the
  per-dimension loss vector.
- ``iou_loss``         <-> IouLoss (`centernet_loss.py:66-91`), target is the
  aligned rotated 3D IoU mapped to [-1, 1].
- ``iou_reg_loss``     <-> IouRegLoss (`centernet_loss.py:94-125`) with the
  axis-aligned IoU/GIoU/DIoU surrogates from
  `det3d/core/utils/center_utils.py:131-226`.

The reference's data-dependent early returns (``if mask.sum() == 0``) become
branchless `where` selects so everything stays jittable.
"""

import jax.numpy as jnp

from ...ops.iou3d import boxes_aligned_iou3d


def gather_feat(feat, ind):
    """(B, H, W, C) feature map + (B, M) flat indices -> (B, M, C).

    Equivalent of `_transpose_and_gather_feat` (`center_utils.py:75-78`)
    on NHWC maps.
    """
    B = feat.shape[0]
    C = feat.shape[-1]
    flat = feat.reshape(B, -1, C)
    return jnp.take_along_axis(flat, ind[..., None].astype(jnp.int32), axis=1)


def fast_focal_loss(out, target, ind, mask, cat):
    """Penalty-reduced focal loss (CornerNet form).

    Args:
      out: (B, H, W, C) sigmoid-activated, clamped heatmap prediction.
      target: (B, H, W, C) gaussian target.
      ind: (B, M) flat peak indices; mask: (B, M); cat: (B, M) class ids.
    """
    maskf = mask.astype(jnp.float32)
    gt = jnp.power(1.0 - target, 4)
    neg_loss = (jnp.log(1.0 - out) * jnp.square(out) * gt).sum()

    pos_pred_pix = gather_feat(out, ind)  # (B, M, C)
    pos_pred = jnp.take_along_axis(
        pos_pred_pix, cat[..., None].astype(jnp.int32), axis=2
    )  # (B, M, 1)
    num_pos = maskf.sum()
    pos_loss = (
        jnp.log(pos_pred) * jnp.square(1.0 - pos_pred) * maskf[..., None]
    ).sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / num_pos)


def reg_loss(output, mask, ind, target):
    """Masked-index L1; returns per-dimension loss vector (D,)."""
    pred = gather_feat(output, ind)  # (B, M, D)
    maskf = mask.astype(jnp.float32)[..., None]
    loss = jnp.abs(pred * maskf - target * maskf)
    loss = loss / (maskf.sum() + 1e-4)
    return loss.sum(axis=(0, 1))


def iou_loss(iou_pred, mask, ind, box_pred, box_gt):
    """IoU-aware confidence loss; target = 2*IoU(pred, gt) - 1."""
    maskf = mask.astype(jnp.float32)
    pred = gather_feat(iou_pred, ind)[..., 0]  # (B, M)
    pred_box = gather_feat(box_pred, ind)  # (B, M, 7)

    B, M = pred.shape
    flat_pred = pred_box.reshape(B * M, -1)
    flat_gt = box_gt.reshape(B * M, -1)
    target = boxes_aligned_iou3d(flat_pred, flat_gt).reshape(B, M)
    target = 2.0 * target - 1.0

    loss = (jnp.abs(pred - target) * maskf).sum()
    return loss / (maskf.sum() + 1e-4)


def _bboxes_to_corners2d(center, dim):
    """Axis-aligned corner pair helper (`center_utils.py:123-128`)."""
    corners_norm = jnp.array(
        [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], dtype=dim.dtype
    )
    return dim[..., None, :] * corners_norm + center[..., None, :]


def _overlap_terms(pred_boxes, gt_boxes):
    qc = _bboxes_to_corners2d(pred_boxes[..., :2], pred_boxes[..., 3:5])
    gc = _bboxes_to_corners2d(gt_boxes[..., :2], gt_boxes[..., 3:5])

    inter_max = jnp.minimum(qc[..., 2, :], gc[..., 2, :])
    inter_min = jnp.maximum(qc[..., 0, :], gc[..., 0, :])
    out_max = jnp.maximum(qc[..., 2, :], gc[..., 2, :])
    out_min = jnp.minimum(qc[..., 0, :], gc[..., 0, :])

    vol_p = pred_boxes[..., 3] * pred_boxes[..., 4] * pred_boxes[..., 5]
    vol_g = gt_boxes[..., 3] * gt_boxes[..., 4] * gt_boxes[..., 5]

    inter_h = jnp.minimum(
        gt_boxes[..., 2] + 0.5 * gt_boxes[..., 5],
        pred_boxes[..., 2] + 0.5 * pred_boxes[..., 5],
    ) - jnp.maximum(
        gt_boxes[..., 2] - 0.5 * gt_boxes[..., 5],
        pred_boxes[..., 2] - 0.5 * pred_boxes[..., 5],
    )
    inter_h = jnp.maximum(inter_h, 0.0)
    inter = jnp.maximum(inter_max - inter_min, 0.0)
    vol_inter = inter[..., 0] * inter[..., 1] * inter_h
    vol_union = vol_g + vol_p - vol_inter

    outer_h = jnp.maximum(
        gt_boxes[..., 2] + 0.5 * gt_boxes[..., 5],
        pred_boxes[..., 2] + 0.5 * pred_boxes[..., 5],
    ) - jnp.minimum(
        gt_boxes[..., 2] - 0.5 * gt_boxes[..., 5],
        pred_boxes[..., 2] - 0.5 * pred_boxes[..., 5],
    )
    outer_h = jnp.maximum(outer_h, 0.0)
    outer = jnp.maximum(out_max - out_min, 0.0)
    return vol_inter, vol_union, outer, outer_h, out_max, out_min


def bbox3d_overlaps_iou(pred_boxes, gt_boxes):
    """Axis-aligned 3D IoU (`center_utils.py:131-154`)."""
    vol_inter, vol_union, *_ = _overlap_terms(pred_boxes, gt_boxes)
    ious = vol_inter / jnp.where(vol_union == 0, 1e-6, vol_union)
    return jnp.clip(ious, 0.0, 1.0)


def bbox3d_overlaps_giou(pred_boxes, gt_boxes):
    """Axis-aligned 3D GIoU (`center_utils.py:157-188`)."""
    vol_inter, vol_union, outer, outer_h, _, _ = _overlap_terms(
        pred_boxes, gt_boxes
    )
    closure = outer[..., 0] * outer[..., 1] * outer_h
    closure_safe = jnp.where(closure == 0, 1e-6, closure)
    union_safe = jnp.where(vol_union == 0, 1e-6, vol_union)
    gious = vol_inter / union_safe - (closure - vol_union) / closure_safe
    return jnp.clip(gious, -1.0, 1.0)


def bbox3d_overlaps_diou(pred_boxes, gt_boxes):
    """Axis-aligned 3D DIoU (`center_utils.py:191-226`)."""
    vol_inter, vol_union, outer, outer_h, _, _ = _overlap_terms(
        pred_boxes, gt_boxes
    )
    inter_diag = jnp.square(gt_boxes[..., 0:3] - pred_boxes[..., 0:3]).sum(-1)
    outer_diag = (
        jnp.square(outer[..., 0]) + jnp.square(outer[..., 1]) + jnp.square(outer_h)
    )
    union_safe = jnp.where(vol_union == 0, 1e-6, vol_union)
    outer_diag_safe = jnp.where(outer_diag == 0, 1e-6, outer_diag)
    dious = vol_inter / union_safe - inter_diag / outer_diag_safe
    return jnp.clip(dious, -1.0, 1.0)


_IOU_FUNCS = {
    "IoU": bbox3d_overlaps_iou,
    "GIoU": bbox3d_overlaps_giou,
    "DIoU": bbox3d_overlaps_diou,
}


def iou_reg_loss(box_pred, mask, ind, box_gt, kind="IoU"):
    """(1 - IoU-variant) regression loss on decoded boxes."""
    maskf = mask.astype(jnp.float32)
    pred_box = gather_feat(box_pred, ind)  # (B, M, 7)
    iou = _IOU_FUNCS[kind](pred_box, box_gt)
    loss = ((1.0 - iou) * maskf).sum() / (maskf.sum() + 1e-4)
    return loss
