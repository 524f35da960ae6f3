import numpy as np
import jax.numpy as jnp
import pytest

from pillarnet_lts_tpu.ops import iou3d


def _mc_overlap(box_a, box_b, n=200_000, seed=0):
    """Monte-Carlo BEV overlap oracle for pcdet bev boxes [x,y,dx,dy,r]."""
    rng = np.random.RandomState(seed)
    # sample inside box_a
    u = rng.uniform(-0.5, 0.5, (n, 2)) * np.array(box_a[2:4])
    c, s = np.cos(box_a[4]), np.sin(box_a[4])
    pts = np.stack(
        [u[:, 0] * c - u[:, 1] * s + box_a[0], u[:, 0] * s + u[:, 1] * c + box_a[1]],
        axis=1,
    )
    # test inside box_b (canonical frame)
    rel = pts - np.array(box_b[:2])
    cb, sb = np.cos(box_b[4]), np.sin(box_b[4])
    lx = rel[:, 0] * cb + rel[:, 1] * sb
    ly = -rel[:, 0] * sb + rel[:, 1] * cb
    inside = (np.abs(lx) <= box_b[2] / 2) & (np.abs(ly) <= box_b[3] / 2)
    area_a = box_a[2] * box_a[3]
    return inside.mean() * area_a


def test_axis_aligned_overlap_exact():
    a = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 0.5, 4.0, 2.0, 0.0]])
    ov = iou3d.rotated_overlap_bev(a, b)
    # overlap = 3 x 1.5
    # rtol floor set by the 1e-5 boundary regularization (_ENLARGE)
    np.testing.assert_allclose(np.asarray(ov), [[4.5]], rtol=5e-5)


def test_identical_box_iou_one():
    rng = np.random.RandomState(3)
    boxes = np.concatenate(
        [
            rng.uniform(-5, 5, (8, 2)),
            rng.uniform(1, 5, (8, 2)),
            rng.uniform(-np.pi, np.pi, (8, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    iou = iou3d.rotated_iou_bev(jnp.array(boxes), jnp.array(boxes))
    np.testing.assert_allclose(np.diag(np.asarray(iou)), 1.0, atol=1e-4)


def test_disjoint_boxes_zero():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b = jnp.array([[10.0, 10.0, 2.0, 2.0, 1.0]])
    ov = iou3d.rotated_overlap_bev(a, b)
    np.testing.assert_allclose(np.asarray(ov), [[0.0]], atol=1e-7)


def test_rotated_overlap_vs_monte_carlo():
    rng = np.random.RandomState(4)
    for trial in range(12):
        a = np.array(
            [
                rng.uniform(-2, 2), rng.uniform(-2, 2),
                rng.uniform(1, 5), rng.uniform(1, 5),
                rng.uniform(-np.pi, np.pi),
            ]
        )
        b = np.array(
            [
                rng.uniform(-2, 2), rng.uniform(-2, 2),
                rng.uniform(1, 5), rng.uniform(1, 5),
                rng.uniform(-np.pi, np.pi),
            ]
        )
        got = float(
            iou3d.rotated_overlap_bev(jnp.array([a]), jnp.array([b]))[0, 0]
        )
        want = _mc_overlap(a, b, seed=trial)
        area = min(a[2] * a[3], b[2] * b[3])
        assert abs(got - want) < 0.02 * max(area, 1.0), (trial, got, want)


def test_containment_overlap():
    # small box fully inside large box (no edge intersections)
    a = jnp.array([[0.0, 0.0, 10.0, 10.0, 0.7]])
    b = jnp.array([[0.0, 0.0, 1.0, 2.0, -0.4]])
    ov = iou3d.rotated_overlap_bev(a, b)
    np.testing.assert_allclose(np.asarray(ov), [[2.0]], rtol=5e-5)
    ov_t = iou3d.rotated_overlap_bev(b, a)
    np.testing.assert_allclose(np.asarray(ov_t), [[2.0]], rtol=5e-5)


def test_aligned_iou3d_matches_pairwise_diag():
    rng = np.random.RandomState(5)
    boxes_a = np.concatenate(
        [
            rng.uniform(-3, 3, (6, 3)),
            rng.uniform(1, 4, (6, 3)),
            rng.uniform(-np.pi, np.pi, (6, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    boxes_b = boxes_a + rng.uniform(-0.3, 0.3, boxes_a.shape).astype(np.float32)
    full = np.asarray(iou3d.boxes_iou3d(jnp.array(boxes_a), jnp.array(boxes_b)))
    aligned = np.asarray(
        iou3d.boxes_aligned_iou3d(jnp.array(boxes_a), jnp.array(boxes_b))
    )
    np.testing.assert_allclose(np.diag(full), aligned, rtol=1e-4, atol=1e-5)


def test_iou3d_det3d_convention_height():
    # identical BEV, disjoint in z -> 3D IoU 0
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 5.0, 2.0, 2.0, 1.0, 0.0]])
    iou = iou3d.boxes_iou3d(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[0.0]], atol=1e-6)
    # same box -> 1
    iou_same = iou3d.boxes_iou3d(a, a)
    np.testing.assert_allclose(np.asarray(iou_same), [[1.0]], atol=1e-5)


@pytest.mark.slow
def test_green_clipping_matches_sorted_formulation():
    """The Green's-theorem clipping (round-2 fast path) and the candidate-
    vertex angular-sort formulation (round-1) are independent derivations of
    the same convex intersection — they must agree on random, clustered,
    touching, and identical box pairs."""
    from pillarnet_lts_tpu.ops.iou3d import (
        _convex_intersection_area,
        _convex_intersection_area_sorted,
        box_corners_bev,
    )

    rng = np.random.RandomState(3)
    n = 256
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, 0:2] = rng.uniform(-8, 8, (n, 2))  # clustered -> many overlaps
    boxes[:, 2:4] = rng.uniform(0.5, 6, (n, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, n)
    # inject exact duplicates and axis-aligned touching pairs
    boxes[10] = boxes[11]
    boxes[20] = [0, 0, 2, 2, 0]
    boxes[21] = [2, 0, 2, 2, 0]  # shares the x=1 edge with boxes[20]
    corners = box_corners_bev(jnp.asarray(boxes))
    a = jnp.broadcast_to(corners[:, None], (n, n, 4, 2))
    b = jnp.broadcast_to(corners[None, :], (n, n, 4, 2))

    fast = np.asarray(_convex_intersection_area(a, b))
    slow = np.asarray(_convex_intersection_area_sorted(a, b))
    areas = boxes[:, 2] * boxes[:, 3]
    np.testing.assert_allclose(fast, slow, atol=2e-3)
    # duplicates -> full overlap, touching -> zero
    np.testing.assert_allclose(fast[10, 11], areas[10], rtol=1e-4)
    assert fast[20, 21] < 1e-3
    # symmetry of the decomposition
    np.testing.assert_allclose(fast, fast.T, atol=2e-3)
