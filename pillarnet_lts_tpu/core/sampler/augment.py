"""Global train-time augmentations (CPU numpy).

Byte-compatible ports of the reference (`det3d/core/sampler/preprocess.py`):
``random_flip_both`` (`:798`), ``global_rotation`` (`:766`),
``global_scaling_v2`` (`:830` — note it scales every column except yaw,
including velocities), ``global_translate_`` (`:935` — note the reference
draws the z noise from std[0]; preserved).
"""

import numpy as np

from ..bbox import box_np_ops


def random_flip_both(gt_boxes, points, probability=0.5, flip_coor=None,
                     rng=None):
    rng = rng or np.random
    # x flip (y = -y)
    if rng.rand() < probability:
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, -1] = -gt_boxes[:, -1] + np.pi
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]

    # y flip (x = -x)
    if rng.rand() < probability:
        if flip_coor is None:
            gt_boxes[:, 0] = -gt_boxes[:, 0]
            points[:, 0] = -points[:, 0]
        else:
            gt_boxes[:, 0] = flip_coor * 2 - gt_boxes[:, 0]
            points[:, 0] = flip_coor * 2 - points[:, 0]
        gt_boxes[:, -1] = -gt_boxes[:, -1] + 2 * np.pi
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 6] = -gt_boxes[:, 6]

    return gt_boxes, points


def global_rotation(gt_boxes, points, rotation=np.pi / 4, rng=None):
    rng = rng or np.random
    if not isinstance(rotation, (list, tuple, np.ndarray)):
        rotation = [-rotation, rotation]
    noise_rotation = rng.uniform(rotation[0], rotation[1])
    points[:, :3] = box_np_ops.rotation_points_single_angle(
        points[:, :3], noise_rotation, axis=2
    )
    gt_boxes[:, :3] = box_np_ops.rotation_points_single_angle(
        gt_boxes[:, :3], noise_rotation, axis=2
    )
    if gt_boxes.shape[1] > 7:
        gt_boxes[:, 6:8] = box_np_ops.rotation_points_single_angle(
            np.hstack([gt_boxes[:, 6:8], np.zeros((gt_boxes.shape[0], 1))]),
            noise_rotation,
            axis=2,
        )[:, :2]
    gt_boxes[:, -1] += noise_rotation
    return gt_boxes, points


def global_scaling_v2(gt_boxes, points, min_scale=0.95, max_scale=1.05,
                      rng=None):
    rng = rng or np.random
    noise_scale = rng.uniform(min_scale, max_scale)
    points[:, :3] *= noise_scale
    gt_boxes[:, :-1] *= noise_scale
    return gt_boxes, points


def global_translate_(gt_boxes, points, noise_translate_std, rng=None):
    rng = rng or np.random
    if not isinstance(noise_translate_std, (list, tuple, np.ndarray)):
        noise_translate_std = np.array(
            [noise_translate_std, noise_translate_std, noise_translate_std]
        )
    if all(e == 0 for e in noise_translate_std):
        return gt_boxes, points
    noise_translate = np.array(
        [
            rng.normal(0, noise_translate_std[0], 1),
            rng.normal(0, noise_translate_std[1], 1),
            rng.normal(0, noise_translate_std[0], 1),
        ]
    ).T
    points[:, :3] += noise_translate
    gt_boxes[:, :3] += noise_translate
    return gt_boxes, points
