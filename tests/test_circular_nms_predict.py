"""CenterHead predict with the circular-NMS test-cfg variant
(CenterPoint-style configs; reference `center_head.py:378-386`)."""

import numpy as np
import jax
import jax.numpy as jnp

from pillarnet_lts_tpu.models.bbox_heads.center_head import CenterHeadMath


def test_circular_nms_predict_path():
    math = CenterHeadMath(
        tasks=[dict(stride=8, class_names=["car"])],
        code_weights=[1.0] * 10,
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2)},
        reg_iou=None,
        pillar_size=0.5,
        point_cloud_range=[-16, -16, -5, 16, 16, 3],
    )
    test_cfg = dict(
        circular_nms=True,
        min_radius=[4.0],
        nms=dict(nms_pre_max_size=32, nms_post_max_size=8),
        score_threshold=0.1,
        post_center_limit_range=[-20, -20, -10, 20, 20, 10],
    )

    rng = np.random.RandomState(0)
    B, H, W = 1, 8, 8
    preds = [{
        "hm": jnp.asarray(rng.randn(B, H, W, 1).astype(np.float32)),
        "reg": jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32)),
        "height": jnp.asarray(rng.randn(B, H, W, 1).astype(np.float32)),
        "dim": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1),
        "rot": jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32)),
    }]

    det = jax.jit(lambda p: math.predict({}, p, test_cfg))(preds)
    assert det["box3d_lidar"].shape == (B, 8, 7)
    kept = np.asarray(det["mask"])
    boxes = np.asarray(det["box3d_lidar"])
    # kept detections must be pairwise farther than sqrt(min_radius)
    pts = boxes[0][kept[0]][:, :2]
    if len(pts) > 1:
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        assert d2.min() > 4.0
