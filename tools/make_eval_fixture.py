"""Generate the devkit-anchored evaluator fixture (judge item r4-#5).

The native evaluators (`datasets/nuscenes/nusc_eval.py`,
`datasets/waymo/waymo_eval.py`) are unit-tested against small hand-computed
oracles, but nothing pinned them against the official protocol at scale.
The official tools cannot run here (nuscenes-devkit / waymo-open-dataset
are not installable in this environment), so this script provides the next
best anchor:

  * INDEPENDENT re-derivations of both protocols, transcribed literally
    from the official sources — the nuScenes devkit's
    `eval/detection/algo.py` (accumulate / calc_ap / calc_tp semantics,
    including cummean nan handling and the confidence-indexed TP-error
    interpolation) and the Waymo metrics library's cutoff-sweep AP — with
    NO shared code with the shipped evaluators: even the rotated 3D IoU is
    recomputed here in pure numpy (Sutherland–Hodgman clipping) rather
    than through `ops/iou3d`.
  * a deterministic, randomized multi-scene synthetic detection set
    (hundreds of boxes, jittered matches, false positives, misses,
    out-of-range boxes, attribute noise) large enough to exercise the
    interpolation/ordering behavior the tiny hand oracles cannot.

Run once; the outputs are committed as `tests/fixtures/eval_fixture.json`
and `tests/test_nusc_eval.py` / `tests/test_waymo_eval.py` assert the
shipped evaluators reproduce them. Reference for what these metrics stand
in for: `det3d/datasets/nuscenes/nuscenes.py:287-293` (official
NuScenesEval call) and `det3d/datasets/waymo/waymo_common.py:53-117`
(detection_pred.bin export for the official binary).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# independent numpy rotated 3D IoU (det3d 7-dim convention, pcdet BEV flip)
# ---------------------------------------------------------------------------


def _corners(x, y, dx, dy, r):
    c, s = np.cos(r), np.sin(r)
    lx = np.array([dx, -dx, -dx, dx]) * 0.5
    ly = np.array([dy, dy, -dy, -dy]) * 0.5
    return np.stack([lx * c - ly * s + x, lx * s + ly * c + y], axis=-1)


def _clip_poly(poly, a, b):
    """Clip polygon by the half-plane left of edge a->b (CCW interior)."""
    out = []
    n = len(poly)
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        dp = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        dq = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if dp >= 0:
            out.append(p)
        if (dp >= 0) != (dq >= 0):
            t = dp / (dp - dq)
            out.append(p + t * (q - p))
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    p = np.asarray(poly)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def np_iou3d(boxes_a, boxes_b):
    """det3d (x, y, z, w, l, h, yaw) pairwise 3D IoU, pure numpy fp64."""
    out = np.zeros((len(boxes_a), len(boxes_b)))
    for i, a in enumerate(boxes_a):
        ca = _corners(a[0], a[1], a[4], a[3], -a[6] - np.pi / 2)
        for j, b in enumerate(boxes_b):
            cb = _corners(b[0], b[1], b[4], b[3], -b[6] - np.pi / 2)
            poly = list(ca)
            for k in range(4):
                poly = _clip_poly(poly, cb[k], cb[(k + 1) % 4])
                if not poly:
                    break
            inter_bev = _poly_area(poly)
            zt = min(a[2] + a[5] / 2, b[2] + b[5] / 2)
            zb = max(a[2] - a[5] / 2, b[2] - b[5] / 2)
            inter = inter_bev * max(zt - zb, 0.0)
            va = a[3] * a[4] * a[5]
            vb = b[3] * b[4] * b[5]
            out[i, j] = inter / max(va + vb - inter, 1e-9)
    return out


# ---------------------------------------------------------------------------
# nuScenes devkit transcription (eval/detection/algo.py)
# ---------------------------------------------------------------------------

NUSC_TP_METRICS = ["trans_err", "scale_err", "orient_err", "vel_err",
                   "attr_err"]
NUSC_CLASS_RANGE = {
    "car": 50, "truck": 50, "bus": 50, "trailer": 50,
    "construction_vehicle": 50, "pedestrian": 40, "motorcycle": 40,
    "bicycle": 40, "traffic_cone": 30, "barrier": 30,
}
NUSC_DIST_THS = [0.5, 1.0, 2.0, 4.0]
NUSC_DIST_TH_TP = 2.0
MIN_RECALL, MIN_PRECISION = 0.1, 0.1


def _devkit_cummean(x):
    if np.sum(np.isnan(x)) == len(x):
        return np.ones(len(x))
    sum_vals = np.nancumsum(x.astype(float))
    count_vals = np.cumsum(~np.isnan(x))
    return np.divide(sum_vals, count_vals,
                     out=np.zeros_like(sum_vals), where=count_vals != 0)


def devkit_accumulate(gt_boxes, pred_boxes, class_name, dist_th):
    """Literal transcription of devkit accumulate(): returns the
    101-point DetectionMetricData dict, or None for the npos==0 /
    no-predictions cases (devkit returns no_predictions MetricData)."""
    npos = sum(1 for boxes in gt_boxes.values()
               for b in boxes if b["detection_name"] == class_name)
    if npos == 0:
        return None

    pred_boxes_list = [(t, b) for t, boxes in pred_boxes.items()
                       for b in boxes
                       if b["detection_name"] == class_name]
    pred_confs = [b["detection_score"] for _, b in pred_boxes_list]
    sortind = [i for (v, i) in sorted(
        ((v, i) for i, v in enumerate(pred_confs)), reverse=True)]

    tp, fp, conf = [], [], []
    match_data = {k: [] for k in NUSC_TP_METRICS}
    match_data["conf"] = []
    taken = set()
    for ind in sortind:
        token, pred_box = pred_boxes_list[ind]
        min_dist = np.inf
        match_gt_idx = None
        for gt_idx, gt_box in enumerate(gt_boxes.get(token, [])):
            if (gt_box["detection_name"] == class_name
                    and (token, gt_idx) not in taken):
                this_distance = float(np.linalg.norm(
                    np.array(pred_box["translation"][:2])
                    - np.array(gt_box["translation"][:2])))
                if this_distance < min_dist:
                    min_dist = this_distance
                    match_gt_idx = gt_idx
        is_match = min_dist < dist_th
        if is_match:
            taken.add((token, match_gt_idx))
            tp.append(1)
            fp.append(0)
            conf.append(pred_box["detection_score"])
            gt_box = gt_boxes[token][match_gt_idx]
            period = np.pi if class_name == "barrier" else 2 * np.pi
            match_data["trans_err"].append(min_dist)
            # scale_err = 1 - iou of aligned boxes
            mins = np.minimum(gt_box["size"], pred_box["size"])
            inter = float(np.prod(mins))
            union = (float(np.prod(gt_box["size"]))
                     + float(np.prod(pred_box["size"])) - inter)
            match_data["scale_err"].append(1.0 - inter / union)
            d = (gt_box["yaw"] - pred_box["yaw"]) % period
            match_data["orient_err"].append(float(min(d, period - d)))
            match_data["vel_err"].append(float(np.linalg.norm(
                np.array(gt_box["velocity"][:2])
                - np.array(pred_box["velocity"][:2]))))
            if gt_box["attribute_name"] == "":
                match_data["attr_err"].append(np.nan)
            else:
                match_data["attr_err"].append(
                    1.0 - float(gt_box["attribute_name"]
                                == pred_box["attribute_name"]))
            match_data["conf"].append(pred_box["detection_score"])
        else:
            tp.append(0)
            fp.append(1)
            conf.append(pred_box["detection_score"])

    if len(match_data["conf"]) == 0 and not tp:
        return None
    tp = np.cumsum(tp).astype(float)
    fp = np.cumsum(fp).astype(float)
    conf = np.array(conf)
    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_interp = np.linspace(0, 1, 101)
    prec = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)

    out = {"recall": rec_interp, "precision": prec, "confidence": conf_i}
    for key in NUSC_TP_METRICS:
        if len(match_data[key]) == 0:
            out[key] = np.ones(101)
            continue
        tmp = _devkit_cummean(np.array(match_data[key]))
        out[key] = np.interp(conf_i, np.array(match_data["conf"])[::-1],
                             tmp[::-1])
    return out


def devkit_calc_ap(md, min_recall, min_precision):
    if md is None:
        return 0.0
    prec = np.copy(md["precision"])
    prec = prec[round(100 * min_recall) + 1:]
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


def devkit_calc_tp(md, min_recall, metric_name):
    if md is None:
        return 1.0
    first_ind = round(100 * min_recall) + 1
    nz = np.nonzero(md["confidence"])[0]
    last_ind = int(nz[-1]) if len(nz) else 0
    if last_ind < first_ind:
        return 1.0
    return float(np.mean(md[metric_name][first_ind:last_ind + 1]))


def devkit_evaluate_nusc(gt_by_token, pred_by_token):
    """devkit DetectionEval.evaluate() + DetectionMetrics aggregation."""
    def filt(by_token, is_pred):
        out = {}
        for token, rows in by_token.items():
            kept = [b for b in rows
                    if b["detection_name"] in NUSC_CLASS_RANGE
                    and np.linalg.norm(np.array(b["translation"][:2]))
                    <= NUSC_CLASS_RANGE[b["detection_name"]]]
            if is_pred and len(kept) > 500:
                kept = sorted(kept, key=lambda b: -b["detection_score"]
                              )[:500]
            out[token] = kept
        return out

    gt = filt(gt_by_token, False)
    pred = filt({t: pred_by_token.get(t, []) for t in gt}, True)

    label_aps, label_tp = {}, {}
    for cls in NUSC_CLASS_RANGE:
        npos = sum(1 for rows in gt.values()
                   for b in rows if b["detection_name"] == cls)
        if npos == 0:
            continue
        aps = {}
        md_tp = None
        for dist_th in NUSC_DIST_THS:
            md = devkit_accumulate(gt, pred, cls, dist_th)
            aps[str(dist_th)] = devkit_calc_ap(md, MIN_RECALL,
                                               MIN_PRECISION)
            if dist_th == NUSC_DIST_TH_TP:
                md_tp = md
        label_aps[cls] = aps
        errs = {}
        for m in NUSC_TP_METRICS:
            if cls == "traffic_cone" and m in ("attr_err", "vel_err",
                                               "orient_err"):
                continue
            if cls == "barrier" and m in ("attr_err", "vel_err"):
                continue
            errs[m] = devkit_calc_tp(md_tp, MIN_RECALL, m)
        label_tp[cls] = errs

    mean_ap = float(np.mean([ap for aps in label_aps.values()
                             for ap in aps.values()])) if label_aps else 0.0
    tp_errors = {}
    for m in NUSC_TP_METRICS:
        vals = [errs[m] for errs in label_tp.values() if m in errs]
        tp_errors[m] = float(np.mean(vals)) if vals else float("nan")
    total = 5.0 * mean_ap
    for m in NUSC_TP_METRICS:
        e = tp_errors[m]
        total += 0.0 if np.isnan(e) else max(0.0, 1.0 - e)
    nd_score = total / 10.0
    return {"mean_ap": mean_ap, "nd_score": nd_score,
            "label_aps": label_aps, "label_tp_errors": label_tp,
            "tp_errors": tp_errors}


# ---------------------------------------------------------------------------
# Waymo oracle: cutoff-sweep AP/APH with scipy Hungarian + numpy IoU
# ---------------------------------------------------------------------------

WAYMO_IOU = {"VEHICLE": 0.7, "PEDESTRIAN": 0.5, "CYCLIST": 0.5}


def oracle_evaluate_waymo(gt_by_token, pred_by_token):
    from scipy.optimize import linear_sum_assignment

    cutoffs = np.linspace(0.0, 1.0, 101)
    result = {"LEVEL_1": {}, "LEVEL_2": {}}
    for cls, thresh in WAYMO_IOU.items():
        frames = []
        npos = {1: 0, 2: 0}
        for token, gt in gt_by_token.items():
            gm = np.asarray(gt["names"]) == cls
            g_boxes = np.asarray(gt["boxes"])[gm]
            g_diff = np.asarray(gt["difficulty"])[gm]
            pred = pred_by_token.get(token)
            if pred is None:
                p_boxes, p_scores = np.zeros((0, 7)), np.zeros(0)
            else:
                pm = np.asarray(pred["names"]) == cls
                p_boxes = np.asarray(pred["boxes"])[pm]
                p_scores = np.asarray(pred["scores"])[pm]
            iou = np_iou3d(g_boxes, p_boxes)
            dy = np.abs(g_boxes[:, 6:7] - p_boxes[None, :, 6]) % (2 * np.pi)
            dy = np.minimum(dy, 2 * np.pi - dy)
            hacc = np.maximum(0.0, 1.0 - dy / np.pi)
            frames.append((iou, hacc, g_diff, p_scores))
            npos[1] += int((g_diff == 1).sum())
            npos[2] += len(g_diff)

        for level in (1, 2):
            if npos[level] == 0:
                continue
            pts = []
            for cut in cutoffs:
                tp = fp = 0
                tph = 0.0
                for iou, hacc, g_diff, p_scores in frames:
                    keep = p_scores >= cut
                    if not keep.any():
                        continue
                    sub = iou[:, keep]
                    cost = np.where(sub >= thresh, -sub, 0.0)
                    rows, cols = linear_sum_assignment(cost)
                    ok = sub[rows, cols] >= thresh
                    rows, cols = rows[ok], cols[ok]
                    counted = g_diff[rows] <= level
                    tp += int(counted.sum())
                    tph += float(hacc[:, keep][rows, cols][counted].sum())
                    fp += int(keep.sum()) - len(rows)
                if tp + fp == 0:
                    continue
                pts.append((tp / npos[level], tp / (tp + fp),
                            tph / npos[level], tph / (tp + fp)))

            def ap_of(rs, ps):
                order = np.argsort(rs)
                r = np.asarray(rs)[order]
                p = np.asarray(ps)[order]
                p = np.maximum.accumulate(p[::-1])[::-1]
                prev, ap = 0.0, 0.0
                for ri, pi in zip(r, p):
                    ap += (ri - prev) * pi
                    prev = ri
                return float(ap)

            result[f"LEVEL_{level}"][cls] = {
                "AP": ap_of([p[0] for p in pts], [p[1] for p in pts]),
                "APH": ap_of([p[2] for p in pts], [p[3] for p in pts]),
            }
    for level in (1, 2):
        per = result[f"LEVEL_{level}"]
        result[f"mAP_L{level}"] = float(np.mean(
            [v["AP"] for v in per.values()])) if per else 0.0
        result[f"mAPH_L{level}"] = float(np.mean(
            [v["APH"] for v in per.values()])) if per else 0.0
    return result


# ---------------------------------------------------------------------------
# deterministic synthetic detection sets
# ---------------------------------------------------------------------------

NUSC_ATTRS = {
    "car": ["vehicle.moving", "vehicle.parked", "vehicle.stopped"],
    "truck": ["vehicle.moving", "vehicle.parked"],
    "bus": ["vehicle.moving", "vehicle.stopped"],
    "trailer": ["vehicle.parked"],
    "construction_vehicle": ["vehicle.parked", "vehicle.moving"],
    "pedestrian": ["pedestrian.moving", "pedestrian.standing"],
    "motorcycle": ["cycle.with_rider", "cycle.without_rider"],
    "bicycle": ["cycle.with_rider", "cycle.without_rider"],
    "traffic_cone": [""],
    "barrier": [""],
}


def synth_nusc_scenes(seed=0, n_tokens=12):
    """Deterministic randomized GT + predictions in the devkit box-dict
    format ({translation, size, yaw, velocity, detection_name,
    detection_score, attribute_name})."""
    rng = np.random.RandomState(seed)
    classes = list(NUSC_CLASS_RANGE)
    gt_by_token, pred_by_token = {}, {}
    for ti in range(n_tokens):
        token = f"tok{ti:03d}"
        gts, preds = [], []
        for cls in classes:
            for _ in range(rng.poisson(2.5)):
                tr = rng.uniform(-55, 55, 3)
                tr[2] = rng.uniform(-2, 1)
                size = np.abs(rng.lognormal(0.5, 0.3, 3)) + 0.5
                yaw = rng.uniform(-np.pi, np.pi)
                vel = rng.randn(2) * 3.0
                attr = NUSC_ATTRS[cls][rng.randint(len(NUSC_ATTRS[cls]))]
                if rng.rand() < 0.1:
                    attr = ""  # missing GT attribute (nan case)
                gt = {"translation": tr.copy(), "size": size.copy(),
                      "yaw": yaw, "velocity": vel.copy(),
                      "detection_name": cls, "attribute_name": attr}
                gts.append(gt)
                # matched prediction(s)
                for _ in range(1 + (rng.rand() < 0.15)):  # dup sometimes
                    if rng.rand() < 0.82:
                        q = rng.rand()  # detection quality
                        preds.append({
                            "translation": tr + rng.randn(3) * (2.2 - 2 * q),
                            "size": size * np.exp(rng.randn(3) * 0.12),
                            "yaw": yaw + rng.randn() * 0.4 * (1.2 - q),
                            "velocity": vel + rng.randn(2) * 0.8,
                            "detection_name": cls,
                            "detection_score": float(
                                np.clip(0.25 + 0.7 * q
                                        + rng.randn() * 0.1, 0, 1)),
                            "attribute_name": (
                                attr if rng.rand() < 0.75
                                else NUSC_ATTRS[cls][rng.randint(
                                    len(NUSC_ATTRS[cls]))]),
                        })
        # false positives
        for _ in range(rng.poisson(10)):
            cls = classes[rng.randint(len(classes))]
            tr = rng.uniform(-55, 55, 3)
            preds.append({
                "translation": tr, "size": np.abs(rng.randn(3)) + 0.8,
                "yaw": rng.uniform(-np.pi, np.pi),
                "velocity": rng.randn(2) * 3,
                "detection_name": cls,
                "detection_score": float(np.clip(
                    rng.beta(1.2, 3.0), 0, 1)),
                "attribute_name": NUSC_ATTRS[cls][
                    rng.randint(len(NUSC_ATTRS[cls]))],
            })
        gt_by_token[token] = gts
        pred_by_token[token] = preds
    return gt_by_token, pred_by_token


def synth_waymo_scenes(seed=1, n_tokens=10):
    """Deterministic randomized Waymo-format GT + predictions:
    {boxes (N, 7 det3d), names, difficulty} / {boxes, names, scores}."""
    rng = np.random.RandomState(seed)
    sizes = {"VEHICLE": (1.9, 4.5, 1.7), "PEDESTRIAN": (0.8, 0.9, 1.7),
             "CYCLIST": (0.8, 1.8, 1.7)}
    gt_by_token, pred_by_token = {}, {}
    for ti in range(n_tokens):
        token = f"seg{ti:03d}"
        g_boxes, g_names, g_diff = [], [], []
        p_boxes, p_names, p_scores = [], [], []
        for cls, base in sizes.items():
            for _ in range(rng.poisson(6)):
                xy = rng.uniform(-60, 60, 2)
                z = rng.uniform(-1, 1)
                wlh = np.asarray(base) * np.exp(rng.randn(3) * 0.08)
                yaw = rng.uniform(-np.pi, np.pi)
                box = np.array([xy[0], xy[1], z, wlh[0], wlh[1], wlh[2],
                                yaw])
                g_boxes.append(box)
                g_names.append(cls)
                g_diff.append(2 if rng.rand() < 0.3 else 1)
                if rng.rand() < 0.8:
                    q = rng.rand()
                    jit = box.copy()
                    jit[:2] += rng.randn(2) * 0.25 * (1.2 - q)
                    jit[3:6] *= np.exp(rng.randn(3) * 0.05)
                    jit[6] += rng.randn() * 0.3 * (1.2 - q)
                    if rng.rand() < 0.07:
                        jit[6] += np.pi  # flipped heading (APH case)
                    p_boxes.append(jit)
                    p_names.append(cls)
                    p_scores.append(float(np.clip(
                        0.3 + 0.65 * q + rng.randn() * 0.08, 0, 1)))
        for _ in range(rng.poisson(6)):
            cls = list(sizes)[rng.randint(3)]
            xy = rng.uniform(-60, 60, 2)
            p_boxes.append(np.array([
                xy[0], xy[1], rng.uniform(-1, 1),
                *(np.asarray(sizes[cls]) * np.exp(rng.randn(3) * 0.1)),
                rng.uniform(-np.pi, np.pi)]))
            p_names.append(cls)
            p_scores.append(float(np.clip(rng.beta(1.2, 3.0), 0, 1)))
        gt_by_token[token] = {
            "boxes": np.asarray(g_boxes).reshape(-1, 7),
            "names": np.asarray(g_names),
            "difficulty": np.asarray(g_diff, np.int64),
        }
        pred_by_token[token] = {
            "boxes": np.asarray(p_boxes).reshape(-1, 7),
            "names": np.asarray(p_names),
            "scores": np.asarray(p_scores),
        }
    return gt_by_token, pred_by_token


def main():
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "eval_fixture.json",
    )
    gt_n, pred_n = synth_nusc_scenes()
    nusc = devkit_evaluate_nusc(gt_n, pred_n)
    gt_w, pred_w = synth_waymo_scenes()
    waymo = oracle_evaluate_waymo(gt_w, pred_w)
    with open(out_path, "w") as f:
        json.dump({"nusc": nusc, "waymo": waymo}, f, indent=1,
                  sort_keys=True)
    print(f"wrote {out_path}")
    print(f"nusc: mAP {nusc['mean_ap']:.4f} NDS {nusc['nd_score']:.4f}")
    print(f"waymo: mAP_L2 {waymo['mAP_L2']:.4f} "
          f"mAPH_L2 {waymo['mAPH_L2']:.4f}")


if __name__ == "__main__":
    main()
