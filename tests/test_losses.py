"""Loss-function golden tests against independently-written numpy oracles
(formulas from the reference `det3d/models/losses/centernet_loss.py` and
`det3d/core/utils/center_utils.py:131-226`)."""

import numpy as np
import jax
import jax.numpy as jnp

from pillarnet_lts_tpu.models.losses import centernet_loss as L


B, H, W, C, M = 2, 4, 4, 3, 6


def _data(seed=0):
    rng = np.random.RandomState(seed)
    out = rng.uniform(0.01, 0.99, (B, H, W, C)).astype(np.float32)
    target = rng.uniform(0, 1, (B, H, W, C)).astype(np.float32)
    ind = rng.randint(0, H * W, (B, M))
    mask = (rng.rand(B, M) > 0.4).astype(np.uint8)
    cat = rng.randint(0, C, (B, M))
    return out, target, ind, mask, cat


def test_fast_focal_loss_oracle():
    out, target, ind, mask, cat = _data()
    got = float(L.fast_focal_loss(
        jnp.array(out), jnp.array(target), jnp.array(ind), jnp.array(mask),
        jnp.array(cat)))

    # oracle
    neg = (np.log(1 - out) * out ** 2 * (1 - target) ** 4).sum()
    flat = out.reshape(B, H * W, C)
    pos_sum = 0.0
    for b in range(B):
        for m in range(M):
            p = flat[b, ind[b, m], cat[b, m]]
            pos_sum += np.log(p) * (1 - p) ** 2 * mask[b, m]
    num_pos = mask.sum()
    want = -(pos_sum + neg) / num_pos
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fast_focal_loss_no_positives():
    out, target, ind, mask, cat = _data()
    mask = np.zeros_like(mask)
    got = float(L.fast_focal_loss(
        jnp.array(out), jnp.array(target), jnp.array(ind), jnp.array(mask),
        jnp.array(cat)))
    neg = (np.log(1 - out) * out ** 2 * (1 - target) ** 4).sum()
    np.testing.assert_allclose(got, -neg, rtol=1e-5)


def test_reg_loss_oracle():
    rng = np.random.RandomState(1)
    D = 8
    output = rng.randn(B, H, W, D).astype(np.float32)
    target = rng.randn(B, M, D).astype(np.float32)
    ind = rng.randint(0, H * W, (B, M))
    mask = (rng.rand(B, M) > 0.5).astype(np.uint8)

    got = np.asarray(L.reg_loss(
        jnp.array(output), jnp.array(mask), jnp.array(ind), jnp.array(target)))

    flat = output.reshape(B, H * W, D)
    pred = np.stack([flat[b, ind[b]] for b in range(B)])
    mf = mask[..., None].astype(np.float32)
    loss = np.abs(pred * mf - target * mf) / (mf.sum() + 1e-4)
    want = loss.sum(axis=(0, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_axis_aligned_iou_variants():
    rng = np.random.RandomState(2)
    n = 20
    pred = np.zeros((n, 7), np.float32)
    gt = np.zeros((n, 7), np.float32)
    pred[:, :3] = rng.uniform(-3, 3, (n, 3))
    pred[:, 3:6] = rng.uniform(1, 4, (n, 3))
    gt[:, :3] = pred[:, :3] + rng.uniform(-0.5, 0.5, (n, 3))
    gt[:, 3:6] = pred[:, 3:6] * rng.uniform(0.8, 1.2, (n, 3))

    iou = np.asarray(L.bbox3d_overlaps_iou(jnp.array(pred), jnp.array(gt)))
    giou = np.asarray(L.bbox3d_overlaps_giou(jnp.array(pred), jnp.array(gt)))
    diou = np.asarray(L.bbox3d_overlaps_diou(jnp.array(pred), jnp.array(gt)))

    # oracle for axis-aligned IoU (rotation-ignoring, per reference formula)
    def aa_iou(p, g):
        lo = np.maximum(p[:2] - p[3:5] / 2, g[:2] - g[3:5] / 2)
        hi = np.minimum(p[:2] + p[3:5] / 2, g[:2] + g[3:5] / 2)
        wh = np.maximum(hi - lo, 0)
        ih = max(
            min(p[2] + p[5] / 2, g[2] + g[5] / 2)
            - max(p[2] - p[5] / 2, g[2] - g[5] / 2), 0)
        inter = wh[0] * wh[1] * ih
        vol = p[3] * p[4] * p[5] + g[3] * g[4] * g[5] - inter
        return np.clip(inter / vol, 0, 1)

    want = np.array([aa_iou(pred[i], gt[i]) for i in range(n)])
    np.testing.assert_allclose(iou, want, rtol=1e-4, atol=1e-5)
    # GIoU <= IoU, DIoU <= IoU always
    assert np.all(giou <= iou + 1e-6)
    assert np.all(diou <= iou + 1e-6)

    # identical boxes: all variants = 1
    same = np.asarray(L.bbox3d_overlaps_giou(jnp.array(pred), jnp.array(pred)))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)


def test_iou_loss_uses_aligned_rotated_iou():
    rng = np.random.RandomState(3)
    D = 1
    iou_pred = rng.randn(B, H, W, 1).astype(np.float32)
    box_pred = np.zeros((B, H, W, 7), np.float32)
    box_pred[..., 3:6] = 2.0
    box_gt = np.zeros((B, M, 7), np.float32)
    box_gt[..., 3:6] = 2.0
    ind = rng.randint(0, H * W, (B, M))
    mask = np.ones((B, M), np.uint8)

    got = float(L.iou_loss(
        jnp.array(iou_pred), jnp.array(mask), jnp.array(ind),
        jnp.array(box_pred), jnp.array(box_gt)))
    # identical boxes everywhere -> target = 2*1-1 = 1
    flat = iou_pred.reshape(B, H * W)
    pred = np.stack([flat[b, ind[b]] for b in range(B)])
    want = np.abs(pred - 1.0).sum() / (mask.sum() + 1e-4)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_box_iou_layer_loss_oracle():
    """IoU-branch L1 target is 2*IoU-1 over fg rows (`roi_head_template.py:117-147`)."""
    import jax.numpy as jnp
    from pillarnet_lts_tpu.models.roi_heads.roi_head_template import (
        box_iou_layer_loss,
    )

    # one fg roi: pred box == gt box -> IoU 1 -> target 1; head says 0.2
    preds = jnp.array([[[0.0, 0, 0, 2, 2, 2, 0], [5, 5, 0, 2, 2, 2, 0]]])
    gt = preds
    rcnn_iou = jnp.array([[0.2, -0.7]])
    fg = jnp.array([[1, 0]])  # second row masked out
    loss = float(box_iou_layer_loss(rcnn_iou, fg, gt, preds, weight=2.0))
    # |0.2 - 1.0| / 1 * 2.0
    assert abs(loss - 1.6) < 1e-5

    # half-overlap fg box: shift x by 1 on a 2-wide box -> bev IoU 1/3
    preds2 = jnp.array([[[1.0, 0, 0, 2, 2, 2, 0]]])
    gt2 = jnp.array([[[0.0, 0, 0, 2, 2, 2, 0]]])
    rcnn = jnp.array([[0.0]])
    loss2 = float(box_iou_layer_loss(rcnn, jnp.array([[1]]), gt2, preds2))
    want = abs(0.0 - (2 * (1 / 3) - 1))
    assert abs(loss2 - want) < 1e-5
