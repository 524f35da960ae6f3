"""Pillar R-CNN two-stage detector.

Port of `det3d/models/detectors/pillar_rcnn.py:9-166` with the whole
two-stage flow inside one jitted apply: first-stage forward -> on-device
decode/NMS of detached proposals -> fixed-size RoI target sampling (train,
via `make_rng('sampler')`) -> BEV RoI-grid pooling -> optional point head ->
RoI refinement head. Loss and final post-processing are parameter-free
methods callable outside apply.

Reference's `reorder_first_stage_prediction` (`:52-83`) padding to
NMS_POST_MAXSIZE is inherent here — the first-stage predict already emits
fixed-size masked outputs.
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import builder
from ..point_heads.point_head import assign_point_targets_2d, point_cls_loss
from ..registry import DETECTORS
from ..roi_heads.proposal_target_layer import proposal_target_layer
from ..roi_heads.roi_head_template import (
    box_cls_layer_loss,
    box_iou_layer_loss,
    box_reg_layer_loss,
    canonicalize_roi_targets,
    generate_predicted_boxes,
)
from .pillarnet import PillarNet


@DETECTORS.register_module
class PillarRCNN(nn.Module):
    first_stage_cfg: dict
    second_stage_modules: Sequence[dict] = ()
    roi_head: Optional[dict] = None
    point_head: Optional[dict] = None
    num_point: int = 1
    freeze: bool = False
    use_final_feature: bool = False
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        fs = dict(self.first_stage_cfg)
        fs.pop("type", None)
        self.single_det = PillarNet(
            **fs, train_cfg=self.train_cfg, test_cfg=self.test_cfg,
            dtype=self.dtype,
        )
        backbone = builder.build_backbone(dict(self.first_stage_cfg["backbone"]))
        first_cfg = dict(
            backbone_channels=backbone.backbone_channels,
            backbone_strides=backbone.backbone_strides,
        )
        self.second_stage = [
            builder.build_second_stage_module(
                {**dict(m), **first_cfg, "dtype": self.dtype}
            )
            for m in self.second_stage_modules
        ]
        if self.roi_head is not None:
            self.roi_head_net = builder.build_roi_head(
                {**dict(self.roi_head), "dtype": self.dtype}
            )
        if self.point_head is not None:
            self.point_head_net = builder.build_point_head(
                {**dict(self.point_head), "dtype": self.dtype}
            )

    # ---- static helpers ------------------------------------------------------
    @nn.nowrap
    def code_size(self):
        return int(self.roi_head.get("code_size", 7))

    @nn.nowrap
    def target_config(self):
        return dict(self.roi_head["model_cfg"]["TARGET_CONFIG"])

    @nn.nowrap
    def loss_config(self):
        return dict(self.roi_head["model_cfg"]["LOSS_CONFIG"])

    # ---- forward --------------------------------------------------------------
    def __call__(self, points, points_mask, gt_boxes_and_cls=None,
                 train: bool = True):
        preds, bev, feats = self.single_det.forward_two_stage(
            points, points_mask, train=(train and not self.freeze)
        )
        if self.freeze:
            preds = jax.tree_util.tree_map(jax.lax.stop_gradient, preds)
            bev = jax.tree_util.tree_map(jax.lax.stop_gradient, bev)
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

        # detached first-stage proposals (`pillarnet.py:68-76`)
        det_preds = jax.tree_util.tree_map(jax.lax.stop_gradient, preds)
        first = self.single_det.predict(
            {}, det_preds, self.single_det.processed_test_cfg()
        )

        code_size = self.code_size()
        boxes = first["box3d_lidar"]
        if code_size == 9 and boxes.shape[-1] == 9:
            # rotation to slot 6 (`pillar_rcnn.py:68-71`)
            boxes = boxes[..., [0, 1, 2, 3, 4, 5, 8, 6, 7]]
        elif boxes.shape[-1] > code_size:
            boxes = jnp.concatenate(
                [boxes[..., :6], boxes[..., -1:]], axis=-1
            )
        valid = first["mask"]
        rois = boxes * valid[..., None]
        roi_labels = (first["label_preds"] + 1) * valid
        roi_scores = first["scores"] * valid

        out = {"one_stage_preds": preds}

        if train:
            gt = gt_boxes_and_cls
            if code_size == 7 and gt.shape[-1] == 10:
                # drop velocity columns (`pillar_rcnn.py:94-96`)
                gt = gt[..., [0, 1, 2, 3, 4, 5, 6, 9]]
            rng = self.make_rng("sampler")
            raw_targets = proposal_target_layer(
                rng, rois, roi_scores, roi_labels, gt, self.target_config()
            )
            targets = canonicalize_roi_targets(raw_targets, code_size)
            rois_used = targets["rois"]
            roi_scores_used = targets["roi_scores"]
            out["targets"] = targets
        else:
            rois_used = rois
            roi_scores_used = roi_scores
            out["roi_labels"] = roi_labels
            out["roi_scores"] = roi_scores

        roi_feats, point_feats, point_coords = self._pool_second_stage(
            bev, feats, rois_used, train
        )
        out["point_coords"] = point_coords

        if self.point_head is not None:
            point_logits = self.point_head_net(point_feats, train)
            out["point_logits"] = point_logits
            if self.model_cfg_att():
                scores = jax.nn.sigmoid(point_logits)
                point_feats = point_feats * scores
                roi_feats = point_feats.reshape(roi_feats.shape)

        head_out = self.roi_head_net(
            roi_feats, rois_used, roi_scores_used, train
        )
        if len(head_out) == 3:
            # IoU-branch heads (RoIFFNHead, `roi_ffn_head.py:113-131`)
            rcnn_cls, rcnn_reg, rcnn_iou = head_out
            out["rcnn_iou"] = rcnn_iou
        else:
            rcnn_cls, rcnn_reg = head_out
        out["rcnn_cls"] = rcnn_cls
        out["rcnn_reg"] = rcnn_reg

        if train and "rcnn_iou" in out:
            # decoded (detached) boxes are the IoU-loss operand
            # (`roi_head_template.py:121-132`)
            _, bbp = generate_predicted_boxes(rois_used, rcnn_cls, rcnn_reg)
            out["batch_box_preds_det"] = jax.lax.stop_gradient(bbp)

        if not train:
            batch_cls_preds, batch_box_preds = generate_predicted_boxes(
                rois_used, rcnn_cls, rcnn_reg
            )
            out["batch_cls_preds"] = batch_cls_preds
            out["batch_box_preds"] = batch_box_preds
        return out

    def _pool_second_stage(self, bev, feats, rois_used, train):
        """RoI-grid pooling over the last neck map (overridden by the legacy
        box-center-pooling `TwoStageDetector`)."""
        bev_feature = bev[-1]
        roi_feats = point_feats = point_coords = None
        for module in self.second_stage:
            roi_feats, point_feats, point_coords = module(
                bev_feature, feats, rois_used, train
            )
        return roi_feats, point_feats, point_coords

    @nn.nowrap
    def model_cfg_att(self):
        if self.point_head is None:
            return False
        return bool(self.point_head["model_cfg"].get("ATT_MODEL", False))

    @nn.nowrap
    def first_stage_math(self):
        """CenterHeadMath for the first stage — usable on the unbound module
        (setup() submodules only exist inside apply)."""
        from ..bbox_heads.center_head import CenterHeadMath

        cfg = dict(self.first_stage_cfg["bbox_head"])
        return CenterHeadMath(
            cfg["tasks"], cfg["code_weights"], cfg["common_heads"],
            cfg.get("reg_iou"), cfg.get("pillar_size", 0.1),
            cfg.get("point_cloud_range", (-75.2, -75.2, -2, 75.2, 75.2, 4)),
        )

    # ---- loss -----------------------------------------------------------------
    @nn.nowrap
    def loss(self, example, out, train_cfg=None):
        """Combined two-stage loss (`pillar_rcnn.py:44-50` combine_loss)."""
        one_stage_loss = self.first_stage_math().loss(
            example, out["one_stage_preds"], train_cfg or self.train_cfg
        )

        targets = out["targets"]
        loss_cfg = self.loss_config()
        weights = loss_cfg["LOSS_WEIGHTS"]
        rcnn_loss_cls = box_cls_layer_loss(
            out["rcnn_cls"], targets["rcnn_cls_labels"],
            weight=weights["rcnn_cls_weight"],
        )
        rcnn_loss_reg = box_reg_layer_loss(
            out["rcnn_reg"], targets["reg_valid_mask"], targets["gt_of_rois"],
            weights["code_weights"], weight=weights["rcnn_reg_weight"],
        )
        roi_loss = rcnn_loss_cls + rcnn_loss_reg

        if "rcnn_iou" in out:
            rcnn_loss_iou = box_iou_layer_loss(
                out["rcnn_iou"], targets["reg_valid_mask"],
                targets["gt_of_rois_src"], out["batch_box_preds_det"],
                weight=weights.get("rcnn_iou_weight", 1.0),
            )
            roi_loss = roi_loss + rcnn_loss_iou

        point_loss = 0.0
        if "point_logits" in out:
            labels = assign_point_targets_2d(
                out["point_coords"], targets["gt_of_rois_src"]
            )
            pw = self.point_head["model_cfg"]["LOSS_CONFIG"]["LOSS_WEIGHTS"][
                "point_cls_weight"
            ]
            point_loss = point_cls_loss(out["point_logits"], labels, weight=pw)

        n_tasks = len(one_stage_loss["loss"])
        one_stage_loss["roi_reg_loss"] = [rcnn_loss_reg] * n_tasks
        one_stage_loss["roi_cls_loss"] = [rcnn_loss_cls] * n_tasks
        if "rcnn_iou" in out:
            one_stage_loss["roi_iou_loss"] = [rcnn_loss_iou] * n_tasks
        if "point_logits" in out:
            one_stage_loss["point_loss"] = [point_loss] * n_tasks
        one_stage_loss["loss"][0] = one_stage_loss["loss"][0] + roi_loss + point_loss
        return one_stage_loss

    # ---- eval post-process -----------------------------------------------------
    @nn.nowrap
    def post_process(self, out):
        """Final scoring (`pillar_rcnn.py:133-166`): score =
        sqrt(sigmoid(iou_cls) * roi_score); masked fixed-size output."""
        box_preds = out["batch_box_preds"]
        cls_preds = out["batch_cls_preds"][..., 0]
        label_preds = out["roi_labels"]
        roi_scores = out["roi_scores"]

        if box_preds.shape[-1] == 9:
            box_preds = box_preds[..., [0, 1, 2, 3, 4, 5, 7, 8, 6]]

        scores = jnp.sqrt(jax.nn.sigmoid(cls_preds) * roi_scores)
        mask = (label_preds != 0) & (box_preds[..., 3:6] > 0).all(-1)
        return {
            "box3d_lidar": box_preds * mask[..., None],
            "scores": scores * mask,
            "label_preds": jnp.maximum(label_preds - 1, 0),
            "mask": mask,
        }
