"""Grouped multi-class NMS (one batched graph, padded pre/post, per-row
traced thresholds) must be exactly equivalent to the per-class loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pillarnet_lts_tpu.models.bbox_heads.center_head import CenterHeadMath


def _head_and_preds(seed=0, B=2, H=12, W=12, ncls=3):
    math = CenterHeadMath(
        tasks=[dict(stride=8, class_names=["veh", "ped", "cyc"][:ncls])],
        code_weights=[1.0] * 10,
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2), "iou": (1, 2)},
        reg_iou="GIoU",
        pillar_size=0.5,
        point_cloud_range=[-16, -16, -5, 16, 16, 3],
    )
    rng = np.random.RandomState(seed)
    preds = [{
        "hm": jnp.asarray(rng.randn(B, H, W, ncls).astype(np.float32)),
        "reg": jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32)),
        "height": jnp.asarray(rng.randn(B, H, W, 1).astype(np.float32)),
        "dim": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.2),
        "rot": jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32)),
        "iou": jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 2 - 1),
    }]
    return math, preds


def _cfg(group):
    # deliberately heterogeneous per-class sizes/thresholds (waymo-style)
    return dict(
        nms=dict(
            use_multi_class_nms=True,
            group_classes=group,
            nms_pre_max_size=[[64, 32, 32]],  # per-task nested (set_by_task_cfg)
            nms_post_max_size=[[16, 8, 8]],
            nms_iou_threshold=[[0.8, 0.55, 0.55]],
        ),
        rectifier=[[0.68, 0.71, 0.65]],
        score_threshold=0.1,
        post_center_limit_range=[-20, -20, -10, 20, 20, 10],
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_grouped_equals_per_class_loop(seed):
    math, preds = _head_and_preds(seed)

    det_g = jax.jit(lambda p: math.predict({}, p, _cfg(True)))(preds)
    det_l = jax.jit(lambda p: math.predict({}, p, _cfg(False)))(preds)

    mask_g = np.asarray(det_g["mask"])
    mask_l = np.asarray(det_l["mask"])
    np.testing.assert_array_equal(mask_g, mask_l)
    assert mask_g.any(), "degenerate test: nothing survived NMS"

    for key in ("box3d_lidar", "scores", "label_preds"):
        a = np.asarray(det_g[key])
        b = np.asarray(det_l[key])
        np.testing.assert_allclose(a[mask_g], b[mask_l], atol=1e-6, err_msg=key)


def test_grouped_respects_per_class_pre_limits():
    """A class whose pre size is tiny must not gain candidates from the
    padded common pre size."""
    math, preds = _head_and_preds(1)
    cfg_small = _cfg(True)
    # classes 1/2 capped well below the padded common pre (64)
    cfg_small["nms"]["nms_pre_max_size"] = [[64, 8, 8]]
    cfg_loop = dict(cfg_small)
    cfg_loop["nms"] = dict(cfg_small["nms"], group_classes=False)

    det_g = jax.jit(lambda p: math.predict({}, p, cfg_small))(preds)
    det_l = jax.jit(lambda p: math.predict({}, p, cfg_loop))(preds)
    np.testing.assert_array_equal(
        np.asarray(det_g["mask"]), np.asarray(det_l["mask"])
    )
    m = np.asarray(det_g["mask"])
    np.testing.assert_allclose(
        np.asarray(det_g["scores"])[m], np.asarray(det_l["scores"])[m],
        atol=1e-6,
    )
