"""Multi-task center-heatmap detection head.

Structural and numerical parity with the reference CenterHead
(`det3d/models/bbox_heads/center_head.py`):

- forward: per-scale shared 3x3 conv + BN + ReLU (`center_head.py:101-106`),
  per-task SepHead branches (reg/height/dim/rot[/vel][/iou] + hm with bias
  init -2.19, `center_head.py:14-51`).
- loss: penalty-reduced focal + masked L1 (+ IoU-aware + IoU-reg losses)
  (`center_head.py:133-214`).
- predict: dense decode (exp-clamped dims `:259`, atan2 rot `:306`, meshgrid
  + reg offsets scaled to metric `:309-315`) followed by fully on-device
  post-processing (`:352-413`): score threshold + center-range mask + one of
  circular NMS / rotated NMS / per-class rotated NMS. Dynamic boolean
  indexing becomes fixed-size top-k + validity masks; outputs are padded to
  the NMS post_max sizes.

Loss/predict are parameter-free math and live on the plain (non-linen)
`CenterHeadMath` class so they can be invoked inside another module's apply
without flax intercepting helper construction as submodule creation.

Deviation (documented): the reference's circular-NMS path considers every
candidate above the score threshold; here candidates are capped at
`nms_pre_max_size` by top-score selection — beyond-cap candidates are far
below any plausible detection score.
"""

import copy
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.nms import circle_nms, rotated_nms, rotated_nms_dynamic
from ..losses.centernet_loss import (
    fast_focal_loss,
    iou_loss,
    iou_reg_loss,
    reg_loss,
)
from ..backbones.base import MaskedConv
from ..registry import HEADS
from ..utils.norm import MaskedBatchNorm

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class SepHead(nn.Module):
    """Separate per-target conv branches (`center_head.py:14-51`).

    Execution is FUSED: the per-branch 3x3 hidden convs (reg/height/dim/rot
    [/vel][/iou]/hm each own a `head_conv`-wide conv) share one input, so
    their kernels concatenate along the output axis into a single wide conv
    — 7 convs with 64 output channels (25% of the MXU's 128+ lanes each)
    become one 448-wide conv at full lane utilization. The final per-branch
    projections become one block-diagonal conv (zero weights across
    branches), which is numerically exact: the extra accumulands are 0.0.
    The parameter tree keeps the reference per-branch layout
    (`{head}_conv0/kernel`, `{head}_bn0/...`, `{head}_out/kernel`), so
    checkpoints are unaffected; branches configured with more than two convs
    (none in the reference zoo) fall back to unfused per-branch execution
    for the extra depth.
    """

    heads: Dict[str, Tuple[int, int]]
    head_conv: int = 64
    init_bias: float = -2.19
    dtype: Any = jnp.float32
    in_channels: int = 64
    # int8 deploy mode for the fused wide first conv (the head's dominant
    # cost): one shared per-tensor input scale (the branches share one
    # input), per-output-channel weights on the concatenated kernel, BN
    # fold riding the dequant vector — the same recipe as the backbone
    # (`backbones/base.py` module comment). The block-diagonal projection
    # stays bf16 (sum(outs) ~26 of 448 lanes — negligible compute).
    quant: bool = False

    def setup(self):
        convs = {}
        bns = {}
        for head, (classes, num_conv) in self.heads.items():
            for i in range(num_conv - 1):
                cin = self.in_channels if i == 0 else self.head_conv
                convs[f"{head}_conv{i}"] = MaskedConv(
                    self.head_conv, cin, kernel_size=3,
                    dtype=self.dtype, name=f"{head}_conv{i}",
                )
                bns[f"{head}_bn{i}"] = MaskedBatchNorm(
                    self.head_conv, dtype=self.dtype, name=f"{head}_bn{i}"
                )
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if "hm" in head
                else nn.initializers.zeros
            )
            cin = self.in_channels if num_conv == 1 else self.head_conv
            convs[f"{head}_out"] = MaskedConv(
                classes, cin, kernel_size=3, bias_init=bias_init,
                dtype=self.dtype, name=f"{head}_out",
            )
        self._convs = convs
        self._bns = bns

    def _conv3x3(self, x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(y.dtype)

    def __call__(self, x, train: bool = True):
        order = list(self.heads.items())
        fused = [h for h, (_, n) in order if n >= 2]
        hc = self.head_conv

        feats = {}
        if fused:
            # one wide first conv over the shared input
            k0 = jnp.concatenate(
                [self._convs[f"{h}_conv0"].kernel for h in fused], axis=-1
            )
            if train:
                b0 = jnp.concatenate(
                    [self._convs[f"{h}_conv0"].bias for h in fused]
                )
                y = self._conv3x3(x, k0, b0)
                pieces = []
                for j, h in enumerate(fused):
                    z = self._bns[f"{h}_bn0"](
                        y[..., j * hc:(j + 1) * hc], mask=None, train=True
                    )
                    pieces.append(nn.relu(z))
                y = jnp.concatenate(pieces, axis=-1)
            else:
                inv, shift = [], []
                for h in fused:
                    i_, s_ = self._bns[f"{h}_bn0"].fold_factors()
                    cb = self._convs[f"{h}_conv0"].bias
                    inv.append(i_)
                    shift.append(cb * i_ + s_)
                inv = jnp.concatenate(inv)
                shift = jnp.concatenate(shift)
                if self.quant and self.has_variable("quant", "in_absmax"):
                    from ..backbones.base import conv_core_int8

                    # per-INPUT-channel activation scales, folded into the
                    # kernel rows (y = sum_c (x_c/s_c) * (s_c*w_c)): the
                    # shared head feature has strongly skewed channel
                    # ranges, and a per-tensor scale measurably collapses
                    # demo mAP (0.28 -> 0.09 — see ROADMAP round 4); the
                    # fold costs nothing at runtime, exactly like the PFE
                    # MLP's recipe (readers/dynamic_pillar_encoder.py)
                    s_x = jnp.maximum(
                        self.get_variable("quant", "in_absmax"), 1e-6
                    ) / 127.0  # (Cin,)
                    w_scaled = k0 * s_x[None, None, :, None]
                    s_w = jnp.maximum(
                        jnp.max(jnp.abs(w_scaled), axis=(0, 1, 2)) / 127.0,
                        1e-12,
                    )
                    wq = jnp.clip(
                        jnp.round(w_scaled * (1.0 / s_w)), -127.0, 127.0
                    ).astype(jnp.int8)
                    xq = jnp.clip(
                        jnp.round(x.astype(jnp.float32) * (1.0 / s_x)),
                        -127.0, 127.0,
                    ).astype(jnp.int8)
                    yq = conv_core_int8(xq, wq, 1, ((1, 1), (1, 1)))
                    y = nn.relu((
                        yq.astype(jnp.float32) * (s_w * inv) + shift
                    ).astype(self.dtype))
                else:
                    if self.quant:
                        self.sow(
                            "quant", "in_absmax",
                            jnp.max(
                                jnp.abs(x), axis=(0, 1, 2)
                            ).astype(jnp.float32),
                            reduce_fn=jnp.maximum,
                            init_fn=lambda: jnp.zeros(
                                (self.in_channels,), jnp.float32),
                        )
                    y = nn.relu(self._conv3x3(x, k0 * inv, shift))
            # extra hidden convs (num_conv > 2): per-branch, unfused
            for j, h in enumerate(fused):
                z = y[..., j * hc:(j + 1) * hc]
                for i in range(1, self.heads[h][1] - 1):
                    z = self._convs[f"{h}_conv{i}"](z)
                    z = self._bns[f"{h}_bn{i}"](z, mask=None, train=train)
                    z = nn.relu(z)
                feats[h] = z
            deep = [h for h in fused if self.heads[h][1] > 2]
            if deep:
                y = jnp.concatenate([feats[h] for h in fused], axis=-1)

        out = {}
        if fused:
            # block-diagonal fused projection over the concatenated hiddens
            outs = [self.heads[h][0] for h in fused]
            total = sum(outs)
            kd = jnp.zeros((3, 3, hc * len(fused), total), jnp.float32)
            bd = jnp.concatenate(
                [self._convs[f"{h}_out"].bias for h in fused]
            )
            off = 0
            for j, h in enumerate(fused):
                kd = jax.lax.dynamic_update_slice(
                    kd, self._convs[f"{h}_out"].kernel,
                    (0, 0, j * hc, off),
                )
                off += outs[j]
            z = self._conv3x3(y, kd, bd)
            off = 0
            for j, h in enumerate(fused):
                out[h] = z[..., off:off + outs[j]]
                off += outs[j]
        for head, (classes, num_conv) in order:
            if num_conv < 2:  # projection straight off the shared input
                out[head] = self._convs[f"{head}_out"](x)
        return out


class CenterHeadMath:
    """Parameter-free decode/loss/predict math for CenterHead outputs.

    Plain python object — safe to construct and call anywhere, including
    inside another flax module's apply.
    """

    def __init__(self, tasks, code_weights, common_heads, reg_iou,
                 pillar_size, point_cloud_range):
        self.tasks = [dict(t) for t in tasks]
        self.code_weights = list(code_weights)
        self.common_heads = dict(common_heads)
        self.reg_iou = reg_iou
        self.pillar_size = float(pillar_size)
        self.point_cloud_range = list(point_cloud_range)

    # ---- static derived config ------------------------------------------------
    @property
    def num_classes(self) -> List[int]:
        return [len(t["class_names"]) for t in self.tasks]

    @property
    def class_names(self) -> List[List[str]]:
        return [list(t["class_names"]) for t in self.tasks]

    @property
    def task_strides(self) -> List[int]:
        return [int(t["stride"]) for t in self.tasks]

    @property
    def task_idx(self) -> List[int]:
        """Scales ordered by stride descending (`center_head.py:75-79`)."""
        strides = sorted(set(self.task_strides), reverse=True)
        return [strides.index(s) for s in self.task_strides]

    @property
    def use_iou(self) -> bool:
        return "iou" in self.common_heads

    @property
    def use_reg_iou(self) -> bool:
        return self.reg_iou is not None

    @property
    def box_n_dim(self) -> int:
        return 9 if "vel" in self.common_heads else 7

    # ---- shared decode --------------------------------------------------------
    def _decode_dense_boxes(self, preds_dict, task_id, with_vel,
                            pre_activated=False):
        """reg/height/dim/rot maps -> metric (B, H, W, D) boxes
        (`center_head.py:171-189` / `:306-326`). Decode math runs in fp32
        regardless of the network compute dtype.

        pre_activated: the double-flip TTA path averages exp-clamped dims
        across the 4 flip variants *before* decode (`center_head.py:258,278`),
        so `dim` arrives already in metric space."""
        preds_dict = {
            k: v.astype(jnp.float32) for k, v in preds_dict.items()
        }
        if pre_activated:
            batch_dim = preds_dict["dim"]
        else:
            batch_dim = jnp.exp(jnp.clip(preds_dict["dim"], -1.2, 3.2))
        batch_rot = jnp.arctan2(
            preds_dict["rot"][..., 0:1], preds_dict["rot"][..., 1:2]
        )
        batch_reg = preds_dict["reg"]
        batch_hei = preds_dict["height"]
        B, H, W, _ = batch_dim.shape

        ys = jax.lax.broadcasted_iota(jnp.float32, (B, H, W, 1), 1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (B, H, W, 1), 2)
        xs = xs + batch_reg[..., 0:1]
        ys = ys + batch_reg[..., 1:2]
        stride = self.task_strides[task_id]
        xs = xs * stride * self.pillar_size + self.point_cloud_range[0]
        ys = ys * stride * self.pillar_size + self.point_cloud_range[1]

        if with_vel:
            return jnp.concatenate(
                [xs, ys, batch_hei, batch_dim, preds_dict["vel"], batch_rot],
                axis=-1,
            )
        return jnp.concatenate([xs, ys, batch_hei, batch_dim, batch_rot], axis=-1)

    # ---- loss -----------------------------------------------------------------
    def loss(self, example, preds_dicts, train_cfg):
        """Training losses (`center_head.py:133-214`)."""
        rets = []
        for task_id, preds_dict in enumerate(preds_dicts):
            preds_dict = {
                k: v.astype(jnp.float32) for k, v in preds_dict.items()
            }
            hm = jnp.clip(jax.nn.sigmoid(preds_dict["hm"]), 1e-4, 1 - 1e-4)
            hm_loss = fast_focal_loss(
                hm,
                example["hm"][task_id],
                example["ind"][task_id],
                example["mask"][task_id],
                example["cat"][task_id],
            )

            target_box = example["anno_box"][task_id]
            if "vel" in preds_dict:
                anno_box = jnp.concatenate(
                    [
                        preds_dict["reg"], preds_dict["height"],
                        preds_dict["dim"], preds_dict["vel"], preds_dict["rot"],
                    ],
                    axis=-1,
                )
            else:
                anno_box = jnp.concatenate(
                    [
                        preds_dict["reg"], preds_dict["height"],
                        preds_dict["dim"], preds_dict["rot"],
                    ],
                    axis=-1,
                )
                target_box = target_box[..., [0, 1, 2, 3, 4, 5, -2, -1]]

            box_loss = reg_loss(
                anno_box, example["mask"][task_id], example["ind"][task_id],
                target_box,
            )
            cw = list(self.code_weights)
            if len(cw) == box_loss.shape[0] + 2 and "vel" not in preds_dict:
                # nuScenes-style 10 weights on a no-vel task: drop the vx/vy
                # slots, mirroring the target_box index selection above
                cw = cw[:6] + cw[-2:]
            if len(cw) != box_loss.shape[0]:
                raise ValueError(
                    f"code_weights has {len(self.code_weights)} entries but "
                    f"the box regression target has {box_loss.shape[0]} dims"
                )
            code_weights = jnp.asarray(cw, dtype=box_loss.dtype)
            loc_loss = (box_loss * code_weights).sum()

            loss = (
                hm_loss * train_cfg["hm_weight"]
                + loc_loss * train_cfg["bbox_weight"]
            )

            ret = {
                "hm_loss": hm_loss,
                "loc_loss": loc_loss,
                "loc_loss_elem": box_loss,
                "num_positive": example["mask"][task_id].astype(jnp.float32).sum(),
            }

            if self.use_iou or self.use_reg_iou:
                batch_box_preds = self._decode_dense_boxes(
                    preds_dict, task_id, with_vel=False
                )

            if self.use_iou:
                il = iou_loss(
                    preds_dict["iou"],
                    example["mask"][task_id],
                    example["ind"][task_id],
                    jax.lax.stop_gradient(batch_box_preds),
                    example["gt_box"][task_id],
                )
                loss = loss + il * train_cfg["iou_weight"]
                ret["iou_loss"] = il

            if self.use_reg_iou:
                rl = iou_reg_loss(
                    batch_box_preds,
                    example["mask"][task_id],
                    example["ind"][task_id],
                    example["gt_box"][task_id],
                    kind=self.reg_iou,
                )
                loss = loss + rl * train_cfg["reg_iou_weight"]
                ret["reg_iou_loss"] = rl

            ret["loss"] = loss
            rets.append(ret)

        merged = {}
        for ret in rets:
            for k, v in ret.items():
                merged.setdefault(k, []).append(v)
        return merged

    # ---- predict ---------------------------------------------------------------
    def predict(self, example, preds_dicts, test_cfg):
        """Decode + on-device post-processing. Returns a dict of padded
        arrays: box3d_lidar (B, K, D), scores (B, K), label_preds (B, K),
        mask (B, K). K = sum of per-task post_max sizes."""
        pre_activated = bool(test_cfg.get("double_flip", False))
        if pre_activated:
            # averaging applies sigmoid/exp/clamp first (reference ordering,
            # `center_head.py:257-303`) so hm/dim/iou arrive pre-activated
            preds_dicts = [_average_double_flip(pd) for pd in preds_dicts]

        # Per-task decode + candidate masking, then tasks with identical
        # static NMS parameters run through ONE batched NMS graph (tasks
        # stacked into the vmap batch). nuScenes' 6 same-stride tasks share
        # a single graph instead of 6 clones — 6x smaller HLO, batched MXU
        # work in the IoU matrix.
        task_inputs = []  # (task_id, group_key, tensors)
        class_offsets = []
        class_offset = 0
        for task_id, preds_dict in enumerate(preds_dicts):
            preds_dict = {
                k: v.astype(jnp.float32) for k, v in preds_dict.items()
            }
            with_vel = "vel" in preds_dict
            if pre_activated:
                batch_hm = preds_dict["hm"]
            else:
                batch_hm = jax.nn.sigmoid(preds_dict["hm"])
            box_preds = self._decode_dense_boxes(
                preds_dict, task_id, with_vel, pre_activated=pre_activated
            )

            if "iou" in preds_dict:
                if pre_activated:
                    batch_iou = preds_dict["iou"][..., 0]
                else:
                    batch_iou = jnp.clip(
                        (preds_dict["iou"][..., 0] + 1.0) * 0.5, 0.0, 1.0
                    )
            else:
                batch_iou = jnp.ones(batch_hm.shape[:3], batch_hm.dtype)

            task_inputs.append((task_id, box_preds, batch_hm, batch_iou))
            class_offsets.append(class_offset)
            class_offset += self.num_classes[task_id]

        results = self._post_process_grouped(task_inputs, test_cfg)

        all_boxes, all_scores, all_labels, all_masks = [], [], [], []
        for task_id, (boxes, scores, labels, mask) in enumerate(results):
            all_boxes.append(boxes)
            all_scores.append(scores)
            all_labels.append(labels + class_offsets[task_id])
            all_masks.append(mask)

        return {
            "box3d_lidar": jnp.concatenate(all_boxes, axis=1),
            "scores": jnp.concatenate(all_scores, axis=1),
            "label_preds": jnp.concatenate(all_labels, axis=1),
            "mask": jnp.concatenate(all_masks, axis=1),
        }

    def _post_process_grouped(self, task_inputs, test_cfg):
        """Group tasks by identical static NMS parameters and run each group
        through one batched post-processing graph."""
        nms_cfg = test_cfg["nms"]

        def task_key(task_id, box_preds, hm):
            def p(x):
                v = x[task_id] if isinstance(x, (list, tuple)) else x
                return tuple(v) if isinstance(v, list) else v

            if test_cfg.get("circular_nms", False) or nms_cfg.get(
                "use_rotate_nms", False
            ):
                return (
                    hm.shape[1:3], box_preds.shape[-1],
                    p(nms_cfg["nms_pre_max_size"]),
                    p(nms_cfg["nms_post_max_size"]),
                    p(nms_cfg.get("nms_iou_threshold", 0.0)),
                    p(test_cfg.get("rectifier", 0.0)),
                    p(test_cfg.get("min_radius", 0.0)),
                )
            return ("solo", task_id)

        groups = {}
        for task_id, box_preds, hm, iou in task_inputs:
            key = task_key(task_id, box_preds, hm)
            groups.setdefault(key, []).append((task_id, box_preds, hm, iou))

        results = [None] * len(task_inputs)
        for key, members in groups.items():
            if len(members) == 1 or key[0] == "solo":
                for task_id, box_preds, hm, iou in members:
                    results[task_id] = self._post_process_task(
                        task_id, box_preds, hm, iou, test_cfg
                    )
                continue

            # stack tasks into the vmap batch: labels/hm channel counts can
            # differ, so scores/labels are computed per task first
            B = members[0][2].shape[0]
            box_dim = members[0][1].shape[-1]
            sc_list, lb_list, bx_list, io_list = [], [], [], []
            for task_id, box_preds, hm, iou in members:
                P = hm.shape[1] * hm.shape[2]
                hm_flat = hm.reshape(B, P, -1)
                sc_list.append(hm_flat.max(axis=-1))
                lb_list.append(hm_flat.argmax(axis=-1))
                bx_list.append(box_preds.reshape(B, P, box_dim))
                io_list.append(iou.reshape(B, P))
            boxes = jnp.concatenate(bx_list, axis=0)  # (T*B, P, D)
            scores = jnp.concatenate(sc_list, axis=0)
            labels = jnp.concatenate(lb_list, axis=0)
            ious = jnp.concatenate(io_list, axis=0)

            out = self._run_single_nms_mode(
                members[0][0], boxes, scores, labels, ious, test_cfg
            )
            T = len(members)
            for i, (task_id, *_rest) in enumerate(members):
                results[task_id] = tuple(
                    o[i * B:(i + 1) * B] for o in out
                )
        return results

    def _run_single_nms_mode(self, task_id, boxes_flat, scores, labels,
                             iou_flat, test_cfg):
        """Shared candidate filtering + NMS on pre-flattened (B', P, *) maps."""
        nms_cfg = test_cfg["nms"]
        sweeps = int(nms_cfg.get("nms_sweeps", 16))
        approx = bool(nms_cfg.get("approx_topk", False))

        def _task_param(p):
            return p[task_id] if isinstance(p, (list, tuple)) else p

        pcr = jnp.asarray(test_cfg["post_center_limit_range"],
                          boxes_flat.dtype)
        dist_ok = (
            (boxes_flat[..., :3] >= pcr[:3]).all(-1)
            & (boxes_flat[..., :3] <= pcr[3:]).all(-1)
        )
        valid = (scores > test_cfg["score_threshold"]) & dist_ok

        if test_cfg.get("circular_nms", False):
            pre_max = int(_task_param(nms_cfg["nms_pre_max_size"]))
            post_max = int(_task_param(nms_cfg["nms_post_max_size"]))
            min_radius = _task_param(test_cfg["min_radius"])
            return _run_nms_batch(
                boxes_flat, scores, labels, valid, scores,
                pre_max, post_max,
                lambda bx, sc, vd: circle_nms(
                    bx[:, :2], vd, min_radius, post_max
                ),
                approx_topk=approx,
            )

        rect = _task_param(test_cfg.get("rectifier", 0.0))
        rect_scores = jnp.power(scores, 1.0 - rect) * jnp.power(iou_flat, rect)
        pre_max = int(_task_param(nms_cfg["nms_pre_max_size"]))
        post_max = int(_task_param(nms_cfg["nms_post_max_size"]))
        thresh = _task_param(nms_cfg["nms_iou_threshold"])
        return _run_nms_batch(
            boxes_flat, scores, labels, valid, rect_scores,
            pre_max, post_max,
            lambda bx, sc, vd: rotated_nms(bx, sc, vd, thresh, post_max,
                                           sweeps=sweeps),
            approx_topk=approx,
        )

    def _post_process_task(self, task_id, box_preds, hm, iou, test_cfg):
        """(B,H,W,*) maps -> padded per-task detections
        (`center_head.py:352-413`)."""
        B, H, W, num_cls = hm.shape
        P = H * W
        boxes_flat = box_preds.reshape(B, P, -1)
        hm_flat = hm.reshape(B, P, num_cls)
        iou_flat = iou.reshape(B, P)

        scores = hm_flat.max(axis=-1)
        labels = hm_flat.argmax(axis=-1)

        pcr = jnp.asarray(test_cfg["post_center_limit_range"], boxes_flat.dtype)
        dist_ok = (
            (boxes_flat[..., :3] >= pcr[:3]).all(-1)
            & (boxes_flat[..., :3] <= pcr[3:]).all(-1)
        )
        valid = (scores > test_cfg["score_threshold"]) & dist_ok

        nms_cfg = test_cfg["nms"]
        sweeps = int(nms_cfg.get("nms_sweeps", 16))
        approx = bool(nms_cfg.get("approx_topk", False))

        def _task_param(p):
            return p[task_id] if isinstance(p, (list, tuple)) else p

        if test_cfg.get("circular_nms", False):
            pre_max = int(_task_param(nms_cfg["nms_pre_max_size"]))
            post_max = int(_task_param(nms_cfg["nms_post_max_size"]))
            min_radius = _task_param(test_cfg["min_radius"])
            return _run_nms_batch(
                boxes_flat, scores, labels, valid, scores,
                pre_max, post_max,
                lambda bx, sc, vd: circle_nms(
                    bx[:, :2], vd, min_radius, post_max
                ),
                approx_topk=approx,
            )

        if nms_cfg.get("use_rotate_nms", False):
            rect = _task_param(test_cfg.get("rectifier", 0.0))
            rect_scores = jnp.power(scores, 1.0 - rect) * jnp.power(
                iou_flat, rect
            )
            pre_max = int(_task_param(nms_cfg["nms_pre_max_size"]))
            post_max = int(_task_param(nms_cfg["nms_post_max_size"]))
            thresh = _task_param(nms_cfg["nms_iou_threshold"])
            return _run_nms_batch(
                boxes_flat, scores, labels, valid, rect_scores,
                pre_max, post_max,
                lambda bx, sc, vd: rotated_nms(bx, sc, vd, thresh, post_max,
                                           sweeps=sweeps),
                approx_topk=approx,
            )

        if nms_cfg.get("use_multi_class_nms", False):
            # per-class NMS (`box_torch_ops.py:325-359`); per-class params were
            # re-organized per task by set_by_task_cfg (`center_utils.py:229`).
            rects = _task_param(test_cfg.get("rectifier", [0.0] * num_cls))
            threshs = _task_param(nms_cfg["nms_iou_threshold"])
            pre_sizes = _task_param(nms_cfg["nms_pre_max_size"])
            post_sizes = _task_param(nms_cfg["nms_post_max_size"])
            if not isinstance(rects, (list, tuple)):
                rects = [rects] * num_cls

            if nms_cfg.get("group_classes", True):
                # one batched graph for all classes: stack classes into the
                # vmap batch, thread per-class thresholds as traced per-row
                # operands, pad pre/post to the class max (per-row pre_limits
                # + per-class output truncation keep results exactly equal to
                # the per-class loop below)
                pre_c = max(int(p) for p in pre_sizes)
                post_c = max(int(p) for p in post_sizes)
                bx_rep, sc_rep, lb_rep, vd_rep, os_rep = [], [], [], [], []
                for k in range(num_cls):
                    bx_rep.append(boxes_flat)
                    sc_rep.append(scores)
                    lb_rep.append(jnp.full_like(labels, k))
                    vd_rep.append(valid & (labels == k))
                    os_rep.append(
                        jnp.power(scores, 1.0 - rects[k])
                        * jnp.power(iou_flat, rects[k])
                    )
                thresh_rows = jnp.repeat(
                    jnp.asarray([float(t) for t in threshs], jnp.float32), B
                )
                pre_rows = jnp.repeat(
                    jnp.asarray([int(p) for p in pre_sizes], jnp.int32), B
                )
                out = _run_nms_batch(
                    jnp.concatenate(bx_rep, 0), jnp.concatenate(sc_rep, 0),
                    jnp.concatenate(lb_rep, 0), jnp.concatenate(vd_rep, 0),
                    jnp.concatenate(os_rep, 0),
                    pre_c, post_c,
                    lambda bx, sc, vd, th: rotated_nms_dynamic(
                        bx, sc, vd, th, post_c, sweeps=sweeps
                    ),
                    approx_topk=approx,
                    pre_limits=pre_rows, extra=thresh_rows,
                )
                return tuple(
                    jnp.concatenate(
                        [
                            out[i][k * B:(k + 1) * B, :int(post_sizes[k])]
                            for k in range(num_cls)
                        ],
                        axis=1,
                    )
                    for i in range(4)
                )

            outs = []
            for k in range(num_cls):
                cls_valid = valid & (labels == k)
                rect_scores = jnp.power(scores, 1.0 - rects[k]) * jnp.power(
                    iou_flat, rects[k]
                )
                outs.append(
                    _run_nms_batch(
                        boxes_flat, scores, jnp.full_like(labels, k),
                        cls_valid, rect_scores,
                        int(pre_sizes[k]), int(post_sizes[k]),
                        lambda bx, sc, vd, _t=threshs[k], _p=int(post_sizes[k]):
                            rotated_nms(bx, sc, vd, _t, _p, sweeps=sweeps),
                        approx_topk=approx,
                    )
                )
            return tuple(
                jnp.concatenate([o[i] for o in outs], axis=1) for i in range(4)
            )

        raise NotImplementedError("no NMS mode selected in test_cfg")


@HEADS.register_module
class CenterHead(nn.Module):
    tasks: Sequence[dict]
    in_channels: Sequence[int]
    code_weights: Sequence[float]
    common_heads: Dict[str, Tuple[int, int]]
    share_channel: int = 64
    reg_iou: Any = None
    pillar_size: float = 0.1
    point_cloud_range: Sequence[float] = (-75.2, -75.2, -2, 75.2, 75.2, 4)
    dtype: Any = jnp.float32
    # int8 deploy mode: shared 3x3 conv + SepHead wide convs run the int8
    # core at eval once calibrated (see SepHead.quant / backbones/base.py)
    quant: bool = False

    @nn.nowrap
    def math(self) -> CenterHeadMath:
        return CenterHeadMath(
            self.tasks, self.code_weights, self.common_heads, self.reg_iou,
            self.pillar_size, self.point_cloud_range,
        )

    @property
    def num_classes(self) -> List[int]:
        return [len(t["class_names"]) for t in self.tasks]

    @property
    def task_strides(self) -> List[int]:
        return [int(t["stride"]) for t in self.tasks]

    @property
    def task_idx(self) -> List[int]:
        strides = sorted(set(self.task_strides), reverse=True)
        return [strides.index(s) for s in self.task_strides]

    # ---- forward ---------------------------------------------------------------
    @nn.compact
    def __call__(self, x: Tuple, train: bool = True):
        assert len(x) == len(self.in_channels)
        share_feats = []
        for k in range(len(self.in_channels)):
            # shared conv + BN: folded at eval (and int8-capable) like the
            # backbone convs; parameter paths match the original nn.Conv
            # form ("share_conv{k}/kernel", "share_conv{k}/bias")
            conv = MaskedConv(
                self.share_channel, x[k].shape[-1], kernel_size=3,
                use_bias=True, kernel_init=_KAIMING, dtype=self.dtype,
                quant=self.quant, name=f"share_conv{k}",
            )
            bn = MaskedBatchNorm(
                self.share_channel, dtype=self.dtype, name=f"share_bn{k}"
            )
            if train:
                y = bn(conv(x[k]), mask=None, train=True)
            else:
                inv, shift = bn.fold_factors()
                y = conv.folded(x[k], inv, shift)
            share_feats.append(nn.relu(y))

        ret_dicts = []
        for k, num_cls in enumerate(self.num_classes):
            heads = dict(copy.deepcopy(dict(self.common_heads)))
            heads["hm"] = (num_cls, 2)
            ret_dicts.append(
                SepHead(
                    heads, dtype=self.dtype, name=f"task{k}",
                    in_channels=self.share_channel, quant=self.quant,
                )(share_feats[self.task_idx[k]], train)
            )
        return ret_dicts

    # thin delegates for API parity with the reference class
    @nn.nowrap
    def loss(self, example, preds_dicts, train_cfg):
        return self.math().loss(example, preds_dicts, train_cfg)

    @nn.nowrap
    def predict(self, example, preds_dicts, test_cfg):
        return self.math().predict(example, preds_dicts, test_cfg)


def _run_nms_batch(boxes, scores, labels, valid, order_scores,
                   pre_max, post_max, nms_fn, approx_topk=False,
                   pre_limits=None, extra=None):
    """Shared fixed-size pipeline: mask -> top-k by order_scores -> NMS ->
    first post_max kept. All per-sample, vmapped over the batch.

    approx_topk uses the TPU-native `lax.approx_max_k` (recall_target 0.99)
    for the candidate pre-selection — a few of the lowest-scoring of the
    pre_max candidates may be swapped, which is far below any detection that
    survives NMS. Enabled per-config (`test_cfg.nms.approx_topk`).

    pre_limits: optional (B,) int array — per-row effective pre size.
      Candidates beyond a row's limit are invalidated, so rows with smaller
      configured pre sizes behave exactly as if top-k'd at their own size
      (greedy suppression is prefix-stable: appended invalid candidates can
      never suppress earlier ones).
    extra: optional (B,)-leading pytree of additional per-row operands
      forwarded to nms_fn (e.g. a per-row IoU threshold)."""

    pre_max = min(pre_max, boxes.shape[1])

    def one(bx, sc, lb, vd, osc, pl, ex):
        key = jnp.where(vd, osc, -jnp.inf)
        if approx_topk:
            top_vals, top_idx = jax.lax.approx_max_k(
                key, pre_max, recall_target=0.99
            )
        else:
            top_vals, top_idx = jax.lax.top_k(key, pre_max)
        cand_boxes = bx[top_idx]
        cand_scores = sc[top_idx]
        cand_labels = lb[top_idx]
        cand_valid = top_vals > -jnp.inf
        if pre_limits is not None:
            cand_valid = cand_valid & (jnp.arange(pre_max) < pl)
        if extra is not None:
            sel_idx, sel_mask = nms_fn(cand_boxes, cand_scores, cand_valid, ex)
        else:
            sel_idx, sel_mask = nms_fn(cand_boxes, cand_scores, cand_valid)
        return (
            cand_boxes[sel_idx],
            cand_scores[sel_idx] * sel_mask,
            cand_labels[sel_idx],
            sel_mask,
        )

    in_axes = (0, 0, 0, 0, 0,
               0 if pre_limits is not None else None,
               0 if extra is not None else None)
    pl = pre_limits if pre_limits is not None else jnp.zeros((), jnp.int32)
    ex = extra if extra is not None else jnp.zeros(())
    return jax.vmap(one, in_axes=in_axes)(
        boxes, scores, labels, valid, order_scores, pl, ex
    )


def _average_double_flip(preds_dict):
    """Double-flip TTA averaging (`center_head.py:233-304`): batch comes in
    groups of 4 (orig, y-flip, x-flip, xy-flip).

    Matches the reference ordering: hm is sigmoided, dim exp-clamped and iou
    (iou+1)/2-clamped *before* the 4-variant mean (`center_head.py:257-303`
    computes the activations first, then `.mean(dim=1)`); reg/rot/height/vel
    average raw after geometric unflipping. The returned hm/dim/iou are
    therefore pre-activated — `predict` must not re-apply the activations."""
    out = {}
    for k, v in preds_dict.items():
        v = v.astype(jnp.float32)
        Bq, H, W, C = v.shape
        v = v.reshape(Bq // 4, 4, H, W, C)
        v1 = jnp.flip(v[:, 1], axis=1)
        v2 = jnp.flip(v[:, 2], axis=2)
        v3 = jnp.flip(v[:, 3], axis=(1, 2))
        out[k] = jnp.stack([v[:, 0], v1, v2, v3], axis=1)

    out["hm"] = jax.nn.sigmoid(out["hm"])
    out["dim"] = jnp.exp(jnp.clip(out["dim"], -1.2, 3.2))
    if "iou" in out:
        out["iou"] = jnp.clip((out["iou"] + 1.0) * 0.5, 0.0, 1.0)

    # undo geometric flips on regression targets before averaging
    reg = out["reg"]
    reg = reg.at[:, 1, ..., 1].set(1 - reg[:, 1, ..., 1])
    reg = reg.at[:, 2, ..., 0].set(1 - reg[:, 2, ..., 0])
    reg = reg.at[:, 3, ..., 0].set(1 - reg[:, 3, ..., 0])
    reg = reg.at[:, 3, ..., 1].set(1 - reg[:, 3, ..., 1])
    out["reg"] = reg

    rot = out["rot"]
    rots = rot[..., 0:1]
    rotc = rot[..., 1:2]
    rotc = rotc.at[:, 1].multiply(-1)
    rots = rots.at[:, 2].multiply(-1)
    rots = rots.at[:, 3].multiply(-1)
    rotc = rotc.at[:, 3].multiply(-1)
    out["rot"] = jnp.concatenate([rots, rotc], axis=-1)

    if "vel" in out:
        vel = out["vel"]
        vel = vel.at[:, 1, ..., 1].multiply(-1)
        vel = vel.at[:, 2, ..., 0].multiply(-1)
        vel = vel.at[:, 3].multiply(-1)
        out["vel"] = vel

    return {k: v.mean(axis=1) for k, v in out.items()}
