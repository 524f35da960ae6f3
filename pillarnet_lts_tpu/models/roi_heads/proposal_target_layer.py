"""RoI target assignment + fg/bg subsampling, fully jittable.

Fixed-size, masked reformulation of the reference ProposalTargetLayer
(`det3d/models/roi_heads/target_assigner/proposal_target_layer.py:8-232`),
which mixes data-dependent boolean indexing, `while` loops and host randints
(SURVEY.md §7 hard part 4). Semantics preserved:

- per-class max-IoU matching (`get_max_iou_with_same_class`, `:201-232`) as a
  label-masked IoU matrix;
- subsample_rois (`:121-166`): up to FG_RATIO*ROI_PER_IMAGE foregrounds drawn
  without replacement (random permutation), background fills the rest split
  hard/easy by HARD_BG_RATIO, drawn with replacement — exactly the
  reference's sampling distribution, realized with fixed-size index algebra;
- 'roi_iou' soft classification labels with the interval ramp (`:44-53`);
- the canonical-frame regression-target transform + heading flip lives in
  `roi_head_template.assign_targets`.

Zero-padded RoIs behave as in the reference: IoU 0 -> easy background.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.iou3d import boxes_iou3d


class RoiTargets(NamedTuple):
    rois: jnp.ndarray           # (B, M, 7+)
    gt_of_rois: jnp.ndarray     # (B, M, code+1) raw (pre-canonical)
    gt_iou_of_rois: jnp.ndarray  # (B, M)
    roi_scores: jnp.ndarray     # (B, M)
    roi_labels: jnp.ndarray     # (B, M)
    reg_valid_mask: jnp.ndarray  # (B, M)
    rcnn_cls_labels: jnp.ndarray  # (B, M)


def _shuffled_member_indices(rng, mask):
    """Indices of True entries of `mask`, randomly ordered, padded with the
    last member repeated (callers only read the first `mask.sum()` or index
    mod count). Also returns the count."""
    n = mask.shape[0]
    key = jnp.where(mask, jax.random.uniform(rng, (n,)), jnp.inf)
    order = jnp.argsort(key)
    return order, mask.sum()


def _pick_with_replacement(rng, ordered_idx, count, out_size):
    """`out_size` draws with replacement from the first `count` entries of
    ordered_idx (mirrors torch.randint sampling, `:174-181`)."""
    r = jax.random.randint(rng, (out_size,), 0, jnp.iinfo(jnp.int32).max)
    pos = r % jnp.maximum(count, 1)
    return ordered_idx[pos]


def _subsample_one(rng, max_overlaps, cfg):
    """(R,) overlaps -> (M,) sampled indices. cfg fields are static."""
    roi_per_image = int(cfg["ROI_PER_IMAGE"])
    fg_per_image = int(round(cfg["FG_RATIO"] * roi_per_image))
    fg_thresh = min(cfg["REG_FG_THRESH"], cfg["CLS_FG_THRESH"])
    hard_ratio = cfg["HARD_BG_RATIO"]

    fg_mask = max_overlaps >= fg_thresh
    easy_mask = max_overlaps < cfg["CLS_BG_THRESH_LO"]
    hard_mask = (max_overlaps < cfg["REG_FG_THRESH"]) & jnp.logical_not(
        easy_mask
    ) & jnp.logical_not(fg_mask)
    # note: reference hard_bg = [BG_LO, REG_FG); rois in [fg_thresh, REG_FG)
    # with CLS_FG > REG_FG would be both fg and hard — keep reference's
    # definition exactly:
    hard_mask = (max_overlaps < cfg["REG_FG_THRESH"]) & (
        max_overlaps >= cfg["CLS_BG_THRESH_LO"]
    )

    k_fg, k_hard, k_easy, k_fgr, k_hardr, k_easyr = jax.random.split(rng, 6)
    fg_idx, n_fg_avail = _shuffled_member_indices(k_fg, fg_mask)
    hard_idx, n_hard = _shuffled_member_indices(k_hard, hard_mask)
    easy_idx, n_easy = _shuffled_member_indices(k_easy, easy_mask)

    n_bg_avail = n_hard + n_easy
    # fg quota (`:134-152`): min(fg_per_image, n_fg) when bg exists, else all
    n_fg = jnp.where(
        n_bg_avail > 0,
        jnp.minimum(fg_per_image, n_fg_avail),
        jnp.where(n_fg_avail > 0, roi_per_image, 0),
    )
    bg_quota = roi_per_image - n_fg

    # hard/easy split (`:169-196`)
    hard_num = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_quota * hard_ratio).astype(jnp.int32), n_hard),
        jnp.where(n_hard > 0, bg_quota, 0),
    )

    # draws
    slots = jnp.arange(roi_per_image)
    # fg picks: permutation without replacement when bg exists; the bg==0
    # branch in the reference draws fg with replacement -> mod count
    fg_pick_wo = fg_idx[jnp.minimum(slots, fg_idx.shape[0] - 1)]
    fg_pick_w = _pick_with_replacement(k_fgr, fg_idx, n_fg_avail,
                                       roi_per_image)
    fg_pick = jnp.where(n_bg_avail > 0, fg_pick_wo, fg_pick_w)

    hard_pick = _pick_with_replacement(k_hardr, hard_idx, n_hard,
                                       roi_per_image)
    easy_pick = _pick_with_replacement(k_easyr, easy_idx, n_easy,
                                       roi_per_image)

    j = slots - n_fg  # bg slot index
    bg_pick = jnp.where(j < hard_num, hard_pick, easy_pick)
    sampled = jnp.where(slots < n_fg, fg_pick, bg_pick)
    return sampled


def _match_one(rois, roi_labels, gt_boxes, gt_labels, by_class):
    """Per-sample max-IoU matching. rois (R, 7), gt (G, 7), labels 1-based;
    gt rows with label 0 are padding."""
    gt_valid = gt_labels > 0
    iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])  # (R, G)
    if by_class:
        match = (roi_labels[:, None] == gt_labels[None, :]) & gt_valid[None, :]
    else:
        match = jnp.broadcast_to(gt_valid[None, :], iou.shape)
    masked = jnp.where(match, iou, -1.0)
    max_overlaps = jnp.maximum(masked.max(axis=1), 0.0)
    has_match = match.any(axis=1)
    assignment = jnp.where(has_match, masked.argmax(axis=1), 0)
    return max_overlaps, assignment


@partial(jax.jit, static_argnames=("cfg_tuple",))
def _proposal_target_impl(rng, rois, roi_scores, roi_labels,
                          gt_boxes_and_cls, cfg_tuple):
    cfg = dict(cfg_tuple)
    B = rois.shape[0]
    code_size = rois.shape[-1]

    def per_sample(key, roi, score, label, gt):
        gt_box = gt[:, :code_size]
        gt_cls = gt[:, -1].astype(jnp.int32)
        max_overlaps, assignment = _match_one(
            roi, label, gt_box, gt_cls,
            by_class=bool(cfg.get("SAMPLE_ROI_BY_EACH_CLASS", False)),
        )
        sampled = _subsample_one(key, max_overlaps, cfg)
        sel_gt = jnp.concatenate(
            [gt_box[assignment[sampled]],
             gt_cls[assignment[sampled]][:, None].astype(gt.dtype)],
            axis=-1,
        )
        return (
            roi[sampled],
            sel_gt,
            max_overlaps[sampled],
            score[sampled],
            label[sampled],
        )

    keys = jax.random.split(rng, B)
    rois_s, gt_of_rois, ious, scores, labels = jax.vmap(per_sample)(
        keys, rois, roi_scores, roi_labels, gt_boxes_and_cls
    )

    reg_valid_mask = (ious > cfg["REG_FG_THRESH"]).astype(jnp.int32)

    if cfg["CLS_SCORE_TYPE"] == "roi_iou":
        fg = ious > cfg["CLS_FG_THRESH"]
        bg = ious < cfg["CLS_BG_THRESH"]
        interval = jnp.logical_not(fg) & jnp.logical_not(bg)
        ramp = (ious - cfg["CLS_BG_THRESH"]) / (
            cfg["CLS_FG_THRESH"] - cfg["CLS_BG_THRESH"]
        )
        cls_labels = jnp.where(interval, ramp, fg.astype(ious.dtype))
    elif cfg["CLS_SCORE_TYPE"] == "cls":
        cls_labels = (ious > cfg["CLS_FG_THRESH"]).astype(jnp.float32)
        ignore = (ious > cfg["CLS_BG_THRESH"]) & (ious < cfg["CLS_FG_THRESH"])
        cls_labels = jnp.where(ignore, -1.0, cls_labels)
    else:
        raise NotImplementedError(cfg["CLS_SCORE_TYPE"])

    return RoiTargets(
        rois=rois_s,
        gt_of_rois=gt_of_rois,
        gt_iou_of_rois=ious,
        roi_scores=scores,
        roi_labels=labels,
        reg_valid_mask=reg_valid_mask,
        rcnn_cls_labels=cls_labels,
    )


def proposal_target_layer(rng, rois, roi_scores, roi_labels,
                          gt_boxes_and_cls, roi_sampler_cfg):
    """Public entry; roi_sampler_cfg is the TARGET_CONFIG dict."""
    cfg_tuple = tuple(sorted(dict(roi_sampler_cfg).items()))
    return _proposal_target_impl(
        rng, rois, roi_scores, roi_labels, gt_boxes_and_cls, cfg_tuple
    )
