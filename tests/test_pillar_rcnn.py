"""Two-stage PillarRCNN forward/loss/predict on tiny shapes (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pillarnet_lts_tpu.models import build_detector


PC_RANGE = [-16.0, -16.0, -3.0, 16.0, 16.0, 3.0]
PILLAR_SIZE = 0.5  # 64x64 grid; strides 8/4 -> 8x8 and 16x16 heatmaps

TASKS = [
    dict(stride=8, class_names=["VEHICLE"]),
    dict(stride=4, class_names=["PEDESTRIAN", "CYCLIST"]),
]

MODEL_CFG = dict(
    type="PillarRCNN",
    freeze=False,
    first_stage_cfg=dict(
        type="PillarNet",
        reader=dict(
            type="DynamicPFE",
            in_channels=5,
            num_filters=(8,),
            pillar_size=PILLAR_SIZE,
            pc_range=PC_RANGE,
        ),
        backbone=dict(type="PillarResNet18", in_channels=8),
        neck=dict(
            type="RPNG",
            layer_nums=[1, 1],
            num_filters=[48, 24],
            in_channels=[64, 64, 32],
        ),
        bbox_head=dict(
            type="CenterHead",
            tasks=TASKS,
            in_channels=[48, 24],
            code_weights=[1.0] * 8,
            common_heads={
                "reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2),
            },
            reg_iou="GIoU",
            pillar_size=PILLAR_SIZE,
            point_cloud_range=PC_RANGE,
        ),
    ),
    second_stage_modules=[
        dict(
            type="BEVStrideFeature",
            feature_sources=["conv3"],
            grid_size=7,
            out_stride=4,
            in_channels=24,
            share_channels=16,
            pillar_size=PILLAR_SIZE,
            pc_range=PC_RANGE,
        )
    ],
    point_head=dict(
        type="PointHead",
        in_channels=16,
        num_class=1,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            CLS_FC=[32],
            TARGET_CONFIG=dict(GT_EXTRA_WIDTH=[0.2, 0.2, 0.2]),
            LOSS_CONFIG=dict(
                LOSS_REG="smooth-l1",
                LOSS_WEIGHTS={"point_cls_weight": 1.0},
            ),
        ),
    ),
    roi_head=dict(
        type="RoIMIXHead",
        in_channels=16,
        mixer_type="",
        num_patches=49,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            SHARED_FC=[32, 32],
            CLS_FC=[32],
            REG_FC=[32],
            DP_RATIO=0.0,
            TARGET_CONFIG=dict(
                ROI_PER_IMAGE=32,
                FG_RATIO=0.5,
                SAMPLE_ROI_BY_EACH_CLASS=True,
                CLS_SCORE_TYPE="roi_iou",
                CLS_FG_THRESH=0.7,
                CLS_BG_THRESH=0.25,
                CLS_BG_THRESH_LO=0.1,
                HARD_BG_RATIO=0.8,
                REG_FG_THRESH=0.5,
            ),
            LOSS_CONFIG=dict(
                CLS_LOSS="BinaryCrossEntropy",
                REG_LOSS="L1",
                LOSS_WEIGHTS={
                    "rcnn_cls_weight": 1.0,
                    "rcnn_reg_weight": 1.0,
                    "code_weights": [1.0] * 7,
                },
            ),
        ),
        code_size=7,
    ),
)

TRAIN_CFG = dict(hm_weight=1, bbox_weight=2, iou_weight=1, reg_iou_weight=2)

TEST_CFG = dict(
    nms=dict(
        use_multi_class_nms=True,
        nms_pre_max_size=[64, 32, 32],
        nms_post_max_size=[16, 8, 8],
        nms_iou_threshold=[0.8, 0.55, 0.55],
    ),
    rectifier=[0, 0, 0],
    score_threshold=0.1,
    post_center_limit_range=[-20, -20, -10, 20, 20, 10],
)

B, N, M = 2, 512, 20


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((B, N, 5), np.float32)
    pts[..., 0] = rng.uniform(-15, 15, (B, N))
    pts[..., 1] = rng.uniform(-15, 15, (B, N))
    pts[..., 2] = rng.uniform(-2, 2, (B, N))
    mask = rng.rand(B, N) > 0.05
    gt = np.zeros((B, M, 10), np.float32)
    n_obj = 5
    gt[:, :n_obj, 0:2] = rng.uniform(-10, 10, (B, n_obj, 2))
    gt[:, :n_obj, 2] = rng.uniform(-1, 0, (B, n_obj))
    gt[:, :n_obj, 3:6] = rng.uniform(1, 4, (B, n_obj, 3))
    gt[:, :n_obj, 6] = rng.uniform(-np.pi, np.pi, (B, n_obj))
    gt[:, :n_obj, 9] = rng.randint(1, 4, (B, n_obj))
    return jnp.array(pts), jnp.array(mask), jnp.array(gt)


def _targets(seed=1):
    rng = np.random.RandomState(seed)
    ex = {"hm": [], "ind": [], "mask": [], "cat": [], "anno_box": [],
          "gt_box": []}
    grid = 64
    for t in TASKS:
        s = t["stride"]
        H = W = grid // s
        ncls = len(t["class_names"])
        ex["hm"].append(jnp.array(rng.rand(B, H, W, ncls).astype(np.float32) * 0.4))
        ex["ind"].append(jnp.array(rng.randint(0, H * W, (B, M))))
        m = np.zeros((B, M), np.uint8)
        m[:, :4] = 1
        ex["mask"].append(jnp.array(m))
        ex["cat"].append(jnp.array(rng.randint(0, ncls, (B, M))))
        ex["anno_box"].append(jnp.array(rng.randn(B, M, 10).astype(np.float32)))
        gtb = np.zeros((B, M, 7), np.float32)
        gtb[..., 3:6] = 1.0
        ex["gt_box"].append(jnp.array(gtb))
    return ex


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(MODEL_CFG, train_cfg=TRAIN_CFG, test_cfg=TEST_CFG)
    pts, mask, gt = _inputs()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        pts, mask, gt, train=True,
    )
    return model, variables


@pytest.mark.slow
def test_two_stage_train_forward_and_loss(model_and_vars):
    model, variables = model_and_vars
    pts, mask, gt = _inputs()
    example = _targets()
    example["gt_boxes_and_cls"] = gt

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, mask, gt, train=True, mutable=["batch_stats"],
            rngs={"sampler": jax.random.PRNGKey(2),
                  "dropout": jax.random.PRNGKey(3)},
        )
        losses = model.loss(example, out, TRAIN_CFG)
        return sum(losses["loss"]), losses

    (loss, losses), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    assert "roi_reg_loss" in losses and "roi_cls_loss" in losses
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total_grad = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total_grad > 0


@pytest.mark.slow
def test_two_stage_eval_predict(model_and_vars):
    model, variables = model_and_vars
    pts, mask, gt = _inputs(seed=5)

    @jax.jit
    def infer(v, p, m):
        out = model.apply(v, p, m, None, train=False)
        return model.post_process(out)

    det = infer(variables, pts, mask)
    R = 32  # sum of per-class post_max sizes
    assert det["box3d_lidar"].shape == (B, R, 7)
    assert det["scores"].shape == (B, R)
    assert np.asarray(det["scores"]).min() >= 0
    lbls = np.asarray(det["label_preds"])
    assert lbls.min() >= 0 and lbls.max() <= 2


def test_proposal_target_layer_quotas():
    from pillarnet_lts_tpu.models.roi_heads.proposal_target_layer import (
        proposal_target_layer,
    )

    rng = np.random.RandomState(0)
    Bq, R, G = 2, 64, 10
    rois = np.zeros((Bq, R, 7), np.float32)
    rois[..., 0:2] = rng.uniform(-10, 10, (Bq, R, 2))
    rois[..., 3:6] = rng.uniform(1, 3, (Bq, R, 3))
    gt = np.zeros((Bq, G, 8), np.float32)
    gt[:, :4, 0:2] = rois[:, :4, 0:2] + 0.1  # overlap the first rois
    gt[:, :4, 3:6] = rois[:, :4, 3:6]
    gt[:, :4, 7] = 1
    labels = np.ones((Bq, R), np.int32)
    scores = rng.rand(Bq, R).astype(np.float32)

    cfg = dict(
        ROI_PER_IMAGE=16, FG_RATIO=0.5, SAMPLE_ROI_BY_EACH_CLASS=True,
        CLS_SCORE_TYPE="roi_iou", CLS_FG_THRESH=0.7, CLS_BG_THRESH=0.25,
        CLS_BG_THRESH_LO=0.1, HARD_BG_RATIO=0.8, REG_FG_THRESH=0.55,
    )
    t = proposal_target_layer(
        jax.random.PRNGKey(0), jnp.array(rois), jnp.array(scores),
        jnp.array(labels), jnp.array(gt), cfg,
    )
    assert t.rois.shape == (Bq, 16, 7)
    # ~4 fg per sample available, all should be selected (quota is 8)
    ious = np.asarray(t.gt_iou_of_rois)
    assert (ious > 0.55).sum(axis=1).max() <= 8
    assert (ious > 0.55).sum() > 0
    # cls labels: fg -> 1, easy bg -> 0, ramp in between
    cls = np.asarray(t.rcnn_cls_labels)
    assert cls.min() >= 0.0 and cls.max() <= 1.0


@pytest.mark.slow
def test_roi_ffn_head_iou_branch_loss():
    """RoIFFNHead's 3-output (cls, reg, iou) path: the IoU-branch L1 loss
    (`roi_head_template.py:117-147`) must be wired into the combined loss."""
    import copy

    cfg = copy.deepcopy(MODEL_CFG)
    cfg["roi_head"] = dict(
        type="RoIFFNHead",
        num_iou_fcs=1,
        content_dim=32,
        feedforward_channels=64,
        code_size=7,
        model_cfg=dict(
            CLASS_AGNOSTIC=True,
            TARGET_CONFIG=MODEL_CFG["roi_head"]["model_cfg"]["TARGET_CONFIG"],
            LOSS_CONFIG=dict(
                CLS_LOSS="BinaryCrossEntropy",
                REG_LOSS="L1",
                IOU_LOSS="L1",
                LOSS_WEIGHTS={
                    "rcnn_cls_weight": 1.0,
                    "rcnn_reg_weight": 1.0,
                    "rcnn_iou_weight": 1.0,
                    "code_weights": [1.0] * 7,
                },
            ),
        ),
    )
    model = build_detector(cfg, train_cfg=TRAIN_CFG, test_cfg=TEST_CFG)
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
        assert "rcnn_iou" in out
        losses = model.loss(example, out, TRAIN_CFG)
        return sum(losses["loss"]), losses

    (loss, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss))
    assert "roi_iou_loss" in losses
    assert np.isfinite(float(losses["roi_iou_loss"][0]))
    assert all(
        np.all(np.isfinite(np.asarray(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )

    # eval path still returns 2-output decode (cls branch scores the box)
    @jax.jit
    def infer(v, p, m):
        out = model.apply(v, p, m, None, train=False)
        return model.post_process(out)

    det = infer(variables, pts, mask)
    assert det["scores"].shape == (B, 32)
