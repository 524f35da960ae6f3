"""Self-contained center-distance AP (nuScenes-style matching).

Used by DemoDataset.evaluation for data-free end-to-end accuracy checks:
greedy match predictions (score-descending) to ground truth within a center
distance threshold, per class; AP = area under the precision-recall curve
(41-point interpolation-free trapezoid like the nuScenes devkit's core).
"""

import numpy as np


def _ap_single(pred_boxes, pred_scores, gt_boxes, thresh):
    """pred (N, >=2 xy), scores (N,), gt (M, >=2 xy) -> AP at distance thresh."""
    n_gt = len(gt_boxes)
    if n_gt == 0:
        return np.nan
    order = np.argsort(-pred_scores)
    pred_boxes = pred_boxes[order]
    taken = np.zeros(n_gt, bool)
    tp = np.zeros(len(pred_boxes))
    fp = np.zeros(len(pred_boxes))
    for i, p in enumerate(pred_boxes):
        if n_gt:
            d = np.linalg.norm(gt_boxes[:, :2] - p[:2], axis=1)
            d[taken] = np.inf
            j = int(np.argmin(d))
            if d[j] <= thresh:
                taken[j] = True
                tp[i] = 1
                continue
        fp[i] = 1
    tp_c = np.cumsum(tp)
    fp_c = np.cumsum(fp)
    recall = tp_c / n_gt
    precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
    # envelope + trapezoid
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    if len(recall) == 0:
        return 0.0
    ap = np.trapezoid(
        np.concatenate([[precision[0]], precision]),
        np.concatenate([[0.0], recall]),
    )
    return float(ap)


def center_distance_map(detections, gts, class_names,
                        thresholds=(0.5, 1.0, 2.0, 4.0)):
    """detections/gts: dict token -> dict with box3d_lidar (N, >=2),
    scores, label_preds (0-based). Returns dict with per-class AP and mAP."""
    per_class = {}
    for cls_id, name in enumerate(class_names):
        aps = []
        for t in thresholds:
            pb, ps, gb = [], [], []
            for token, det in detections.items():
                gt = gts.get(token)
                if gt is None:
                    continue
                dm = np.asarray(det["label_preds"]) == cls_id
                gm = np.asarray(gt["label_preds"]) == cls_id
                pb.append(np.asarray(det["box3d_lidar"])[dm])
                ps.append(np.asarray(det["scores"])[dm])
                gb.append(np.asarray(gt["box3d_lidar"])[gm])
            if not pb:
                continue
            # evaluate over the concatenated set with per-token offsets to
            # avoid cross-token matches: offset each token's xy far apart
            off = 0.0
            pb2, gb2 = [], []
            for p, g in zip(pb, gb):
                p = p.copy()
                g = g.copy()
                if p.size:
                    p[:, 0] += off
                if g.size:
                    g[:, 0] += off
                off += 10000.0
                pb2.append(p)
                gb2.append(g)
            pred_boxes = np.concatenate(pb2) if pb2 else np.zeros((0, 2))
            scores = np.concatenate(ps) if ps else np.zeros((0,))
            gt_boxes = np.concatenate(gb2) if gb2 else np.zeros((0, 2))
            ap = _ap_single(pred_boxes, scores, gt_boxes, t)
            if not np.isnan(ap):
                aps.append(ap)
        if aps:
            per_class[name] = float(np.mean(aps))
    mean_ap = float(np.mean(list(per_class.values()))) if per_class else 0.0
    return {"per_class": per_class, "mAP": mean_ap}
