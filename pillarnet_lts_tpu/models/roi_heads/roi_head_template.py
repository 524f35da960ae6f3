"""RoI head shared math: target canonicalization, losses, box decoding.

Pure-function port of `RoIHeadTemplate`
(`det3d/models/roi_heads/roi_head_template.py:13-219`): the canonical-frame
regression-target transform with heading flip (`:41-83`), BCE cls + weighted
L1 reg losses (`:85-168`), and `generate_predicted_boxes`
de-canonicalization (`:189-219`).
"""

import jax
import jax.numpy as jnp


def limit_period(val, offset=0.5, period=jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """points (..., N, 3+C), angle (...,): rotation increasing x->y
    (`box_torch_ops.py:120-138` — note points @ [[c,-s],[s,c],..] layout)."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    # match torch: points @ [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    xr = points[..., 0:1] * c + points[..., 1:2] * s
    yr = points[..., 0:1] * (-s) + points[..., 1:2] * c
    return jnp.concatenate([xr, yr, points[..., 2:]], axis=-1)


def canonicalize_roi_targets(targets, code_size):
    """assign_targets post-processing (`roi_head_template.py:41-83`):
    transform gt boxes into each RoI's canonical frame + heading flip.

    targets: RoiTargets namedtuple (raw gt_of_rois).
    Returns dict with 'gt_of_rois' canonical and 'gt_of_rois_src' raw.
    """
    rois = targets.rois
    gt_of_rois_src = targets.gt_of_rois
    gt = gt_of_rois_src

    roi_ry = limit_period(rois[..., 6], offset=0.5, period=2 * jnp.pi)

    gt6 = gt[..., :6] - rois[..., :6]
    gt_rest = gt[..., 6:]
    gt = jnp.concatenate([gt6, gt_rest], axis=-1)
    gt = gt.at[..., 6].set(gt[..., 6] - roi_ry)

    # rotate xyz (and anything in slots 0:3) into the canonical frame
    B, M = gt.shape[:2]
    pts = gt.reshape(B * M, 1, -1)
    rot = rotate_points_along_z(pts, -roi_ry.reshape(B * M))
    gt = rot.reshape(B, M, -1)

    if rois.shape[-1] == 9:
        # relative velocity (`:63`)
        gt = gt.at[..., 7:-1].set(gt[..., 7:-1] - rois[..., 7:])

    heading = gt[..., 6] % (2 * jnp.pi)
    opposite = (heading > jnp.pi * 0.5) & (heading < jnp.pi * 1.5)
    heading = jnp.where(opposite, (heading + jnp.pi) % (2 * jnp.pi), heading)
    heading = jnp.where(heading > jnp.pi, heading - 2 * jnp.pi, heading)
    heading = jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2)
    gt = gt.at[..., 6].set(heading)

    return {
        "rois": rois,
        "gt_of_rois": gt,
        "gt_of_rois_src": gt_of_rois_src,
        "gt_iou_of_rois": targets.gt_iou_of_rois,
        "roi_scores": targets.roi_scores,
        "roi_labels": targets.roi_labels,
        "reg_valid_mask": targets.reg_valid_mask,
        "rcnn_cls_labels": targets.rcnn_cls_labels,
    }


def box_cls_layer_loss(rcnn_cls, rcnn_cls_labels, weight=1.0):
    """BCE with soft labels; -1 labels ignored (`:152-168`)."""
    logits = rcnn_cls.reshape(-1)
    labels = rcnn_cls_labels.reshape(-1)
    p = jnp.clip(jax.nn.sigmoid(logits), 1e-7, 1 - 1e-7)
    per = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    valid = (labels >= 0).astype(jnp.float32)
    loss = (per * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    return loss * weight


def box_reg_layer_loss(rcnn_reg, reg_valid_mask, gt_of_rois, code_weights,
                       weight=1.0):
    """Weighted L1 on canonical-frame targets over fg rois (`:85-118`)."""
    code_size = rcnn_reg.shape[-1]
    targets = gt_of_rois[..., :code_size].reshape(-1, code_size)
    preds = rcnn_reg.reshape(-1, code_size)
    fg = (reg_valid_mask.reshape(-1) > 0).astype(jnp.float32)
    per = jnp.abs(preds - targets) * jnp.asarray(code_weights, preds.dtype)
    loss = (per.sum(-1) * fg).sum() / jnp.maximum(fg.sum(), 1.0)
    return loss * weight


def box_iou_layer_loss(rcnn_iou, reg_valid_mask, gt_of_rois_src,
                       batch_box_preds, weight=1.0):
    """IoU-branch L1 loss (`roi_head_template.py:117-147`): target is
    2*IoU3d(decoded box, gt) - 1 over fg rois, decoded boxes detached.
    Padded/background rows are masked by reg_valid_mask, so their degenerate
    zero boxes never contribute."""
    from ...ops.iou3d import boxes_aligned_iou3d

    preds = jax.lax.stop_gradient(batch_box_preds[..., :7].reshape(-1, 7))
    gt = gt_of_rois_src[..., :7].reshape(-1, 7)
    fg = (reg_valid_mask.reshape(-1) > 0).astype(jnp.float32)
    iou_targets = 2.0 * boxes_aligned_iou3d(preds, gt) - 1.0
    per = jnp.abs(rcnn_iou.reshape(-1) - iou_targets)
    loss = (per * fg).sum() / jnp.maximum(fg.sum(), 1.0)
    return loss * weight


def generate_predicted_boxes(rois, cls_preds, box_preds):
    """Canonical-frame residuals -> world boxes (`:189-219`).

    rois (B, N, C); cls_preds (B*N, k); box_preds (B*N, C).
    """
    B, N, code_size = rois.shape
    batch_cls_preds = cls_preds.reshape(B, N, -1)
    batch_box_preds = box_preds.reshape(B, N, code_size)

    roi_ry = rois[..., 6].reshape(-1)
    roi_xyz = rois[..., 0:3].reshape(-1, 3)

    local_rois = rois.at[..., 0:3].set(0.0)
    preds = (batch_box_preds + local_rois).reshape(B * N, code_size)
    preds = rotate_points_along_z(preds[:, None, :], roi_ry)[:, 0, :]
    preds = preds.at[:, 0:3].add(roi_xyz)
    return batch_cls_preds, preds.reshape(B, N, code_size)
