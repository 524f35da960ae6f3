"""Legacy VoxelNet / TwoStageDetector (box-center pooling) on tiny shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pillarnet_lts_tpu.core.bbox import box_np_ops
from pillarnet_lts_tpu.models import build_detector
from pillarnet_lts_tpu.models.detectors.legacy import box_center_points

from test_pillar_rcnn import (
    MODEL_CFG, PC_RANGE, PILLAR_SIZE, TEST_CFG, TRAIN_CFG, _inputs, _targets,
    B,
)


def test_box_center_points_matches_corner_midpoints():
    """num_point=5 must reproduce the reference's corner-midpoint layout
    (`two_stage.py:58-75`: (c0+c1)/2, (c2+c3)/2, (c0+c3)/2, (c1+c2)/2)."""
    rng = np.random.RandomState(0)
    K = 6
    rois = np.zeros((1, K, 7), np.float32)
    rois[0, :, 0:2] = rng.uniform(-5, 5, (K, 2))
    rois[0, :, 3:5] = rng.uniform(1, 4, (K, 2))
    rois[0, :, 6] = rng.uniform(-np.pi, np.pi, K)

    got = np.asarray(box_center_points(jnp.array(rois), 5))[0]

    corners = box_np_ops.center_to_corner_box2d(
        rois[0, :, :2], rois[0, :, 3:5], rois[0, :, 6]
    )
    want = np.concatenate(
        [
            rois[0, :, :2],
            (corners[:, 0] + corners[:, 1]) / 2,
            (corners[:, 2] + corners[:, 3]) / 2,
            (corners[:, 0] + corners[:, 3]) / 2,
            (corners[:, 1] + corners[:, 2]) / 2,
        ],
        axis=0,
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_voxelnet_alias_forward():
    cfg = dict(MODEL_CFG["first_stage_cfg"])
    cfg["type"] = "VoxelNet"
    model = build_detector(cfg, train_cfg=TRAIN_CFG, test_cfg=TEST_CFG)
    pts, mask, _ = _inputs()
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    preds = model.apply(variables, pts, mask, train=False)
    det = model.predict({}, preds, model.processed_test_cfg())
    assert det["scores"].shape[0] == B


def _legacy_cfg(num_point):
    cfg = {k: v for k, v in MODEL_CFG.items() if k != "point_head"}
    cfg["type"] = "TwoStageDetector"
    cfg["num_point"] = num_point
    cfg["second_stage_modules"] = [
        dict(
            type="BEVFeatureExtractor",
            pc_start=PC_RANGE[:2],
            voxel_size=[PILLAR_SIZE, PILLAR_SIZE],
            out_stride=4,
            num_point=num_point,
        )
    ]
    roi_head = dict(MODEL_CFG["roi_head"])
    roi_head["type"] = "RoIHead"
    roi_head.pop("mixer_type"), roi_head.pop("num_patches")
    roi_head.pop("in_channels")
    roi_head["input_channels"] = 24 * num_point  # last neck map channels
    roi_head["add_box_param"] = True
    cfg["roi_head"] = roi_head
    return cfg


@pytest.mark.parametrize("num_point", [1, 5])
@pytest.mark.slow
def test_two_stage_detector_train_and_eval(num_point):
    model = build_detector(
        _legacy_cfg(num_point), train_cfg=TRAIN_CFG, test_cfg=TEST_CFG
    )
    pts, mask, gt = _inputs()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        pts, mask, gt, train=True,
    )

    example = _targets()
    example["gt_boxes_and_cls"] = gt

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, mask, gt, train=True, mutable=["batch_stats"],
            rngs={"sampler": jax.random.PRNGKey(2),
                  "dropout": jax.random.PRNGKey(3)},
        )
        return sum(model.loss(example, out, TRAIN_CFG)["loss"])

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )

    @jax.jit
    def infer(v, p, m):
        out = model.apply(v, p, m, None, train=False)
        return model.post_process(out)

    det = infer(variables, pts, mask)
    assert det["box3d_lidar"].shape == (B, 32, 7)
    assert np.asarray(det["scores"]).min() >= 0
