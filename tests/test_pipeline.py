"""Data pipeline golden tests: AssignLabel target encoding, Preprocess
augmentation invariants, collation padding."""

import numpy as np
import pytest

from pillarnet_lts_tpu.core.target.center_target import (
    draw_gaussian, gaussian_radius,
)
from pillarnet_lts_tpu.datasets.pipelines.preprocess import AssignLabel, Preprocess
from pillarnet_lts_tpu.parallel.collate import collate_batch


TASKS = [
    dict(stride=8, class_names=["car"]),
    dict(stride=8, class_names=["pedestrian"]),
]

ASSIGNER_CFG = dict(
    target_assigner=dict(tasks=TASKS),
    dense_reg=1,
    gaussian_overlap=0.1,
    max_objs=20,
    min_radius=2,
    pc_range=[-16.0, -16.0, -5.0, 16.0, 16.0, 3.0],
    pillar_size=0.5,
)


def _res(boxes, names, classes):
    return {
        "type": "NuScenesDataset",
        "mode": "train",
        "lidar": {
            "annotations": {
                "gt_boxes": boxes,
                "gt_names": names,
                "gt_classes": classes,
            },
            "points": np.zeros((10, 5), np.float32),
        },
    }


def test_assign_label_encoding():
    # one car at a known location
    boxes = np.array(
        [[4.0, -2.0, -0.5, 2.0, 4.0, 1.5, 1.0, -1.0, 0.3]], np.float32
    )
    res = _res(boxes, np.array(["car"]), np.array([1], np.int32))
    assign = AssignLabel(cfg=ASSIGNER_CFG)
    res, _ = assign(res, {})
    ex = res["lidar"]["targets"]

    # grid: 64 / 8 = 8 cells per axis at stride 8 (cell = 4 m)
    assert ex["hm"][0].shape == (8, 8, 1)
    assert ex["hm"][1].shape == (8, 8, 1)

    # center cell: coor = (4 - (-16)) / 4 = 5 ; (-2 + 16)/4 = 3.5 -> int 3
    assert ex["mask"][0][0] == 1
    assert ex["ind"][0][0] == 3 * 8 + 5
    assert ex["cat"][0][0] == 0
    # peak value 1 at the center cell
    assert ex["hm"][0][3, 5, 0] == pytest.approx(1.0)

    # anno_box: [dx, dy, z, log dims, vx, vy, sin r, cos r]
    anno = ex["anno_box"][0][0]
    np.testing.assert_allclose(anno[0], 5.0 - 5, atol=1e-6)  # ct.x - int x
    np.testing.assert_allclose(anno[1], 3.5 - 3, atol=1e-6)
    np.testing.assert_allclose(anno[2], -0.5, atol=1e-6)
    np.testing.assert_allclose(anno[3:6], np.log([2.0, 4.0, 1.5]), atol=1e-6)
    np.testing.assert_allclose(anno[6:8], [1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(anno[8], np.sin(0.3), atol=1e-6)
    np.testing.assert_allclose(anno[9], np.cos(0.3), atol=1e-6)

    # gt_box row: (x, y, z, w, l, h, rot)
    np.testing.assert_allclose(
        ex["gt_box"][0][0], [4.0, -2.0, -0.5, 2.0, 4.0, 1.5, 0.3], atol=1e-6
    )
    # second task empty
    assert ex["mask"][1].sum() == 0

    # gt_boxes_and_cls reordered (x,y,z,w,l,h,rot,vx,vy,cls)
    gtc = ex["gt_boxes_and_cls"][0]
    np.testing.assert_allclose(
        gtc, [4.0, -2.0, -0.5, 2.0, 4.0, 1.5, 0.3, 1.0, -1.0, 1.0], atol=1e-6
    )


def test_assign_label_out_of_range_object_skipped():
    boxes = np.array(
        [[100.0, 100.0, 0.0, 2.0, 4.0, 1.5, 0, 0, 0.0]], np.float32
    )
    res = _res(boxes, np.array(["car"]), np.array([1], np.int32))
    assign = AssignLabel(cfg=ASSIGNER_CFG)
    res, _ = assign(res, {})
    ex = res["lidar"]["targets"]
    assert ex["mask"][0].sum() == 0
    assert ex["hm"][0].max() == 0


def test_gaussian_radius_and_draw():
    r = gaussian_radius((10.0, 5.0), min_overlap=0.1)
    assert r > 0
    hm = np.zeros((16, 16), np.float32)
    draw_gaussian(hm, np.array([8.3, 8.7]), 3)
    assert hm[8, 8] == pytest.approx(1.0)  # peak at int center
    assert hm[8, 11] > 0 and hm[8, 12] == 0  # truncated at radius


def test_preprocess_augmentation_keeps_points_in_boxes():
    """Aug transforms apply the same rigid map to boxes and points: a point
    at a box center stays at the center."""
    rng = np.random.RandomState(0)
    boxes = np.concatenate(
        [
            rng.uniform(-8, 8, (4, 2)),
            rng.uniform(-1, 0, (4, 1)),
            rng.uniform(1, 3, (4, 3)),
            rng.uniform(-2, 2, (4, 2)),
            rng.uniform(-np.pi, np.pi, (4, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    pts = np.concatenate(
        [boxes[:, :3], np.zeros((4, 2), np.float32)], axis=1
    )

    cfg = dict(
        mode="train",
        shuffle_points=False,
        global_rot_noise=[-0.78, 0.78],
        global_scale_noise=[0.9, 1.1],
        global_translate_std=0.5,
        db_sampler=None,
        class_names=["car"],
    )
    prep = Preprocess(cfg=cfg)
    res = {
        "type": "NuScenesDataset",
        "mode": "train",
        "lidar": {
            "combined": pts.copy(),
            "annotations": {
                "boxes": boxes.copy(),
                "names": np.array(["car"] * 4),
            },
        },
        "metadata": {"image_prefix": "", "num_point_features": 5},
    }
    np.random.seed(3)
    res, _ = prep(res, {})
    out_pts = res["lidar"]["points"]
    out_boxes = res["lidar"]["annotations"]["gt_boxes"]
    np.testing.assert_allclose(out_pts[:, :3], out_boxes[:, :3], atol=1e-4)


def test_collate_pads_and_stacks():
    ex1 = {
        "points": np.ones((100, 5), np.float32),
        "hm": [np.zeros((8, 8, 1), np.float32)],
        "ind": [np.zeros(20, np.int64)],
        "mask": [np.zeros(20, np.uint8)],
        "cat": [np.zeros(20, np.int64)],
        "anno_box": [np.zeros((20, 10), np.float32)],
        "gt_box": [np.zeros((20, 7), np.float32)],
        "gt_boxes_and_cls": np.zeros((20, 10), np.float32),
        "metadata": {"token": "a"},
    }
    ex2 = dict(ex1, points=np.ones((150, 5), np.float32),
               metadata={"token": "b"})
    batch = collate_batch([ex1, ex2], max_points=256)
    assert batch["points"].shape == (2, 256, 5)
    assert batch["points_mask"].sum() == 250
    assert batch["hm"][0].shape == (2, 8, 8, 1)
    assert batch["gt_boxes_and_cls"].shape == (2, 20, 10)
    assert [m["token"] for m in batch["metadata"]] == ["a", "b"]
