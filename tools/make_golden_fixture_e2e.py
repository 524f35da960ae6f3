"""Generate the committed END-TO-END golden fixture (golden_e2e_r3.npz).

Unlike the stage-level fixtures (independent numpy oracles,
`make_golden_fixtures.py`), this one freezes the COMPOSITION: a tiny
PillarNet-18 (fixed committed parameters, fixed input cloud) all the way
from raw points to final decoded + NMS-ed detections. Any regression in
the glue between stages — mask plumbing, decode offsets, task ordering,
NMS candidate routing — changes the recorded boxes/scores/keep-set even
when each stage passes its own oracle test.

The parameters are stored IN the fixture (path-keyed leaves), so the
replay is insensitive to init-RNG changes and tests exactly the compute
path. Reference analog: a trained-checkpoint eval producing fixed mAP
(`tools/dist_test.py` + `configs/nusc/README.md:14-16`).

Run: python tools/make_golden_fixture_e2e.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden_e2e_r3.npz",
)


def model_cfg():
    """Tiny PillarNet-18S + RPNV2 + 2-task CenterHead (~150k params)."""
    tasks = [
        dict(stride=4, class_names=["car"]),
        dict(stride=4, class_names=["pedestrian", "cyclist"]),
    ]
    pc_range = [-16.0, -16.0, -4.0, 16.0, 16.0, 2.0]
    pillar = 0.25  # 128 x 128 grid
    return dict(
        type="PillarNet",
        reader=dict(
            type="DynamicPFE", in_channels=5, num_filters=(8,),
            pillar_size=pillar, pc_range=pc_range,
        ),
        backbone=dict(type="PillarResNet18S", in_channels=8),
        neck=dict(
            type="RPNV2", layer_nums=[2, 2], num_filters=32,
            in_channels=[32, 64],
        ),
        bbox_head=dict(
            type="CenterHead",
            tasks=tasks,
            in_channels=[32],
            code_weights=[1.0] * 8 + [0.2, 0.2],
            common_heads={
                "reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                "rot": (2, 2), "iou": (1, 2),
            },
            reg_iou="GIoU",
            pillar_size=pillar,
            point_cloud_range=pc_range,
        ),
    ), dict(
        nms=dict(
            use_rotate_nms=True, nms_pre_max_size=256,
            nms_post_max_size=64, nms_iou_threshold=0.2,
        ),
        rectifier=0.5,
        score_threshold=0.05,
        post_center_limit_range=[-20.0, -20.0, -6.0, 20.0, 20.0, 4.0],
    )


def make_cloud(seed=7, n=4096):
    rng = np.random.RandomState(seed)
    r = np.minimum(rng.exponential(6.0, n) + 0.5, 21.0)
    th = rng.uniform(-np.pi, np.pi, n)
    pts = np.zeros((1, n, 5), np.float32)
    pts[0, :, 0] = r * np.cos(th)
    pts[0, :, 1] = r * np.sin(th)
    pts[0, :, 2] = rng.uniform(-2.5, 1.0, n)
    pts[0, :, 3] = rng.uniform(0, 255, n)
    pts[0, :, 4] = rng.uniform(0, 0.45, n)
    for cx, cy in [(4, 2), (-6, 5), (8, -7), (-3, -9), (11, 4)]:
        m = rng.choice(n, 140, replace=False)
        pts[0, m, 0] = cx + rng.randn(140) * 0.8
        pts[0, m, 1] = cy + rng.randn(140) * 0.8
        pts[0, m, 2] = rng.uniform(-1.5, 0.2, 140)
    mask = rng.rand(1, n) > 0.03
    return pts, mask


def main():
    from pillarnet_lts_tpu.models import build_detector

    mcfg, tcfg = model_cfg()
    model = build_detector(mcfg, train_cfg=None, test_cfg=tcfg)
    pts, msk = make_cloud()
    pts_j, msk_j = jnp.asarray(pts), jnp.asarray(msk)
    variables = model.init(jax.random.PRNGKey(42), pts_j, msk_j, train=False)

    preds = model.apply(variables, pts_j, msk_j, train=False)
    det = model.predict({}, preds, model.processed_test_cfg())

    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        flat["var:" + jax.tree_util.keystr(path)] = np.asarray(leaf)
    n_det = int(np.asarray(det["mask"]).sum())
    print("params:", sum(v.size for k, v in flat.items()), "leaves:",
          len(flat), "dets:", n_det)
    assert n_det >= 5, "fixture should record a non-trivial keep-set"

    np.savez_compressed(
        OUT,
        points=pts, points_mask=msk,
        box3d_lidar=np.asarray(det["box3d_lidar"]),
        scores=np.asarray(det["scores"]),
        label_preds=np.asarray(det["label_preds"]),
        det_mask=np.asarray(det["mask"]),
        **flat,
    )
    print("wrote", OUT, os.path.getsize(OUT) // 1024, "KB")


if __name__ == "__main__":
    main()
