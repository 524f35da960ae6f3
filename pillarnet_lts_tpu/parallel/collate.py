"""Batch collation with static-shape padding.

Equivalent of `collate_kitti` (`det3d/torchie/parallel/collate.py:91-171`)
adapted to XLA's static-shape discipline: variable-length point clouds are
padded into a fixed (B, N_max, C) buffer with a validity mask instead of the
reference's list-of-tensors; per-task target arrays are stacked exactly as
the reference does.

`N_max` either comes from config (`max_points`) or is bucketed to the next
power-of-two-ish size so recompilation happens at most a handful of times.
"""

import numpy as np

_TARGET_LIST_KEYS = ("hm", "anno_box", "ind", "mask", "cat", "gt_box")
_STACK_KEYS = ("gt_boxes_and_cls",)


def bucket_size(n, buckets=None):
    """Round n up to a static bucket to bound recompiles."""
    if buckets is None:
        # 1.5x-spaced buckets
        b = 2048
        while b < n:
            b = int(b * 1.5)
        return b
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def collate_batch(batch_list, max_points=None, pad_to_bucket=True):
    """List of pipeline example dicts -> batched numpy arrays.

    Returns dict with 'points' (B, N, C) float32, 'points_mask' (B, N) bool,
    stacked per-task targets, and 'metadata' list.
    """
    # flatten double-flip groups (Reformat returns lists of 4)
    flat = []
    for ex in batch_list:
        if isinstance(ex, list):
            flat.extend(ex)
        else:
            flat.append(ex)
    batch_list = flat

    out = {}
    points_list = [np.asarray(ex["points"]) for ex in batch_list]
    num_feats = points_list[0].shape[1]
    n_max = max(p.shape[0] for p in points_list)
    if max_points is not None:
        n_max = max_points
    elif pad_to_bucket:
        n_max = bucket_size(n_max)

    B = len(batch_list)
    points = np.zeros((B, n_max, num_feats), np.float32)
    mask = np.zeros((B, n_max), bool)
    for i, p in enumerate(points_list):
        n = min(p.shape[0], n_max)
        points[i, :n] = p[:n]
        mask[i, :n] = True
    out["points"] = points
    out["points_mask"] = mask

    example = batch_list[0]
    for key in _TARGET_LIST_KEYS:
        if key not in example:
            continue
        num_tasks = len(example[key])
        out[key] = [
            np.stack([np.asarray(ex[key][t]) for ex in batch_list])
            for t in range(num_tasks)
        ]
    for key in _STACK_KEYS:
        if key in example:
            out[key] = np.stack([np.asarray(ex[key]) for ex in batch_list])

    out["metadata"] = [ex.get("metadata") for ex in batch_list]
    return out
