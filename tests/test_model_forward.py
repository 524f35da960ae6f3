import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pillarnet_lts_tpu.models import build_detector


PC_RANGE = [-8.0, -8.0, -3.0, 8.0, 8.0, 3.0]
PILLAR_SIZE = 0.5  # 32x32 grid; stride 8 -> 4x4 heatmaps

TASKS = [
    dict(stride=8, class_names=["car"]),
    dict(stride=8, class_names=["pedestrian", "cyclist"]),
]

MODEL_CFG = dict(
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
        type="RPNV1",
        layer_nums=[1, 1],
        num_filters=32,
        in_channels=[64, 64],
    ),
    bbox_head=dict(
        type="CenterHead",
        tasks=TASKS,
        in_channels=[32],
        code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0],
        common_heads={
            "reg": (2, 2), "height": (1, 2), "dim": (3, 2),
            "rot": (2, 2), "vel": (2, 2), "iou": (1, 2),
        },
        reg_iou="GIoU",
        pillar_size=PILLAR_SIZE,
        point_cloud_range=PC_RANGE,
    ),
)

TRAIN_CFG = dict(hm_weight=1, bbox_weight=0.25, iou_weight=1, reg_iou_weight=0.25)

TEST_CFG = dict(
    nms=dict(
        use_rotate_nms=True,
        nms_pre_max_size=16,
        nms_post_max_size=8,
        nms_iou_threshold=0.2,
    ),
    rectifier=0.0,
    score_threshold=0.1,
    post_center_limit_range=[-10, -10, -5, 10, 10, 5],
)

B, N, M = 2, 256, 10


def _make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((B, N, 5), np.float32)
    pts[..., 0] = rng.uniform(-8, 8, (B, N))
    pts[..., 1] = rng.uniform(-8, 8, (B, N))
    pts[..., 2] = rng.uniform(-3, 3, (B, N))
    pts[..., 3] = rng.uniform(0, 1, (B, N))
    mask = rng.rand(B, N) > 0.1
    return jnp.array(pts), jnp.array(mask)


def _make_targets(seed=1):
    rng = np.random.RandomState(seed)
    example = {"hm": [], "ind": [], "mask": [], "cat": [], "anno_box": [], "gt_box": []}
    H = W = 4
    for t in TASKS:
        ncls = len(t["class_names"])
        example["hm"].append(jnp.array(rng.rand(B, H, W, ncls).astype(np.float32) * 0.5))
        example["ind"].append(jnp.array(rng.randint(0, H * W, (B, M))))
        m = np.zeros((B, M), np.uint8)
        m[:, :3] = 1
        example["mask"].append(jnp.array(m))
        example["cat"].append(jnp.array(rng.randint(0, ncls, (B, M))))
        example["anno_box"].append(
            jnp.array(rng.randn(B, M, 10).astype(np.float32))
        )
        gt = np.zeros((B, M, 7), np.float32)
        gt[..., :3] = rng.uniform(-5, 5, (B, M, 3))
        gt[..., 3:6] = rng.uniform(1, 3, (B, M, 3))
        gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, M))
        example["gt_box"].append(jnp.array(gt))
    return example


@pytest.fixture(scope="module")
def model_and_params():
    model = build_detector(MODEL_CFG, train_cfg=TRAIN_CFG, test_cfg=TEST_CFG)
    pts, mask = _make_inputs()
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    return model, variables


def test_forward_shapes(model_and_params):
    model, variables = model_and_params
    pts, mask = _make_inputs()
    preds = model.apply(variables, pts, mask, train=False)
    assert len(preds) == 2
    assert preds[0]["hm"].shape == (B, 4, 4, 1)
    assert preds[1]["hm"].shape == (B, 4, 4, 2)
    for key, ch in [("reg", 2), ("height", 1), ("dim", 3), ("rot", 2),
                    ("vel", 2), ("iou", 1)]:
        assert preds[0][key].shape == (B, 4, 4, ch)


def test_forward_jit_and_batchnorm_mutation(model_and_params):
    model, variables = model_and_params
    pts, mask = _make_inputs()

    @jax.jit
    def fwd_train(v, p, m):
        return model.apply(v, p, m, train=True, mutable=["batch_stats"])

    preds, new_state = fwd_train(variables, pts, mask)
    assert "batch_stats" in new_state
    # running stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


@pytest.mark.slow
def test_loss_and_grads(model_and_params):
    model, variables = model_and_params
    pts, mask = _make_inputs()
    example = _make_targets()

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, mask, train=True, mutable=["batch_stats"],
        )
        losses = model.loss(example, preds, TRAIN_CFG)
        return sum(losses["loss"])

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    gnorms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(g) for g in gnorms)
    assert sum(gnorms) > 0


def test_predict_padded_output(model_and_params):
    model, variables = model_and_params
    pts, mask = _make_inputs()

    @jax.jit
    def infer(v, p, m):
        preds = model.apply(v, p, m, train=False)
        return model.predict({}, preds, model.processed_test_cfg())

    det = infer(variables, pts, mask)
    K = 8 * len(TASKS)
    assert det["box3d_lidar"].shape == (B, K, 9)
    assert det["scores"].shape == (B, K)
    assert det["label_preds"].shape == (B, K)
    assert det["mask"].shape == (B, K)
    labels = np.asarray(det["label_preds"])
    m = np.asarray(det["mask"])
    assert labels[m].max(initial=0) <= 2
