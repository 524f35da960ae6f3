"""Evaluation helpers: padded device detections -> per-sample host dicts."""

import numpy as np


def detections_to_host(det, metadata):
    """Split a batched padded detection dict into per-sample dicts.

    det: {'box3d_lidar': (B, K, D), 'scores': (B, K), 'label_preds': (B, K),
          'mask': (B, K)} (device or numpy arrays)
    metadata: list of length B.
    Returns list of dicts shaped like the reference's per-sample outputs
    (`center_head.py:405-409`), with padding rows removed.
    """
    boxes = np.asarray(det["box3d_lidar"])
    scores = np.asarray(det["scores"])
    labels = np.asarray(det["label_preds"])
    mask = np.asarray(det["mask"]).astype(bool)

    out = []
    for i in range(boxes.shape[0]):
        m = mask[i]
        out.append(
            {
                "box3d_lidar": boxes[i][m],
                "scores": scores[i][m],
                "label_preds": labels[i][m],
                "metadata": metadata[i] if metadata else None,
            }
        )
    return out
