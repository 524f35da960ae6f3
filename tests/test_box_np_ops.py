import numpy as np
import pytest

from pillarnet_lts_tpu.core.bbox import box_np_ops


def test_limit_period():
    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, 2.5 * np.pi])
    out = box_np_ops.limit_period(vals, offset=0.5, period=2 * np.pi)
    assert np.all(out >= -np.pi) and np.all(out < np.pi)
    # representative values equal mod 2pi
    np.testing.assert_allclose(
        np.mod(out - vals, 2 * np.pi), 0, atol=1e-9
    )


def test_corners_axis_aligned():
    dims = np.array([[2.0, 4.0]])
    centers = np.array([[10.0, 20.0]])
    corners = box_np_ops.center_to_corner_box2d(centers, dims, np.array([0.0]))
    assert corners.shape == (1, 4, 2)
    xs = sorted(corners[0, :, 0])
    ys = sorted(corners[0, :, 1])
    np.testing.assert_allclose(xs, [9, 9, 11, 11])
    np.testing.assert_allclose(ys, [18, 18, 22, 22])


def test_corners_rotation_preserves_extent():
    rng = np.random.RandomState(0)
    dims = rng.uniform(1, 5, (10, 2))
    centers = rng.uniform(-10, 10, (10, 2))
    angles = rng.uniform(-np.pi, np.pi, 10)
    corners = box_np_ops.center_to_corner_box2d(centers, dims, angles)
    # edge lengths preserved under rotation
    e01 = np.linalg.norm(corners[:, 1] - corners[:, 0], axis=-1)
    e12 = np.linalg.norm(corners[:, 2] - corners[:, 1], axis=-1)
    # corner order x0y0, x0y1, x1y1, x1y0: edge 0-1 spans dim y, 1-2 spans x
    np.testing.assert_allclose(e01, dims[:, 1], rtol=1e-6)
    np.testing.assert_allclose(e12, dims[:, 0], rtol=1e-6)


def test_points_in_rbbox_matches_corner_oracle():
    rng = np.random.RandomState(1)
    boxes = np.concatenate(
        [
            rng.uniform(-5, 5, (6, 3)),      # centers
            rng.uniform(1, 4, (6, 3)),       # dims
            rng.uniform(-np.pi, np.pi, (6, 1)),
        ],
        axis=1,
    )
    points = rng.uniform(-8, 8, (500, 3))
    inside = box_np_ops.points_in_rbbox(points, boxes)

    # Oracle: corner-based half-space test per box
    corners = box_np_ops.center_to_corner_box3d(
        boxes[:, :3], boxes[:, 3:6], boxes[:, -1]
    )
    for b in range(boxes.shape[0]):
        c = corners[b]
        # box axes from corner layout (0: x0y0z0, 6: x1y1z0 ... see corners_nd)
        lo = c.min(0)  # not axis aligned; use projection instead
        u = c[7] - c[3]  # x-direction edge (x0y1z1 -> x1y1z1)? use robust proj
        # robust: project points onto the box's three principal axes
        axes = np.stack([c[4] - c[0], c[3] - c[0], c[1] - c[0]])  # x, y, z edges
        rel = points - c[0]
        for ax in range(3):
            a = axes[ax]
            t = rel @ a / (a @ a)
            proj_inside = (t >= -1e-6) & (t <= 1 + 1e-6)
            if ax == 0:
                ok = proj_inside
            else:
                ok &= proj_inside
        np.testing.assert_array_equal(inside[:, b], ok)


def _reference_collision(boxes, qboxes, clockwise=True):
    """Direct scalar port of the reference numba kernel
    (`det3d/core/sampler/preprocess.py:849-928`) used as test oracle."""
    N, K = boxes.shape[0], qboxes.shape[0]
    ret = np.zeros((N, K), dtype=bool)
    slices = np.array([1, 2, 3, 0])
    lines_boxes = np.stack((boxes, boxes[:, slices, :]), axis=2)
    lines_qboxes = np.stack((qboxes, qboxes[:, slices, :]), axis=2)
    boxes_standup = np.concatenate([boxes.min(1), boxes.max(1)], axis=1)
    qboxes_standup = np.concatenate([qboxes.min(1), qboxes.max(1)], axis=1)
    for i in range(N):
        for j in range(K):
            iw = min(boxes_standup[i, 2], qboxes_standup[j, 2]) - max(
                boxes_standup[i, 0], qboxes_standup[j, 0])
            if iw <= 0:
                continue
            ih = min(boxes_standup[i, 3], qboxes_standup[j, 3]) - max(
                boxes_standup[i, 1], qboxes_standup[j, 1])
            if ih <= 0:
                continue
            for k in range(4):
                for l in range(4):
                    A = lines_boxes[i, k, 0]
                    B = lines_boxes[i, k, 1]
                    C = lines_qboxes[j, l, 0]
                    D = lines_qboxes[j, l, 1]
                    acd = (D[1] - A[1]) * (C[0] - A[0]) > (C[1] - A[1]) * (D[0] - A[0])
                    bcd = (D[1] - B[1]) * (C[0] - B[0]) > (C[1] - B[1]) * (D[0] - B[0])
                    if acd != bcd:
                        abc = (C[1] - A[1]) * (B[0] - A[0]) > (B[1] - A[1]) * (C[0] - A[0])
                        abd = (D[1] - A[1]) * (B[0] - A[0]) > (B[1] - A[1]) * (D[0] - A[0])
                        if abc != abd:
                            ret[i, j] = True
                            break
                if ret[i, j]:
                    break
            if not ret[i, j]:
                box_overlap_qbox = True
                for l in range(4):
                    for k in range(4):
                        vec = boxes[i, k] - boxes[i, (k + 1) % 4]
                        if clockwise:
                            vec = -vec
                        cross = vec[1] * (boxes[i, k, 0] - qboxes[j, l, 0])
                        cross -= vec[0] * (boxes[i, k, 1] - qboxes[j, l, 1])
                        if cross >= 0:
                            box_overlap_qbox = False
                            break
                    if not box_overlap_qbox:
                        break
                if not box_overlap_qbox:
                    qbox_overlap_box = True
                    for l in range(4):
                        for k in range(4):
                            vec = qboxes[j, k] - qboxes[j, (k + 1) % 4]
                            if clockwise:
                                vec = -vec
                            cross = vec[1] * (qboxes[j, k, 0] - boxes[i, l, 0])
                            cross -= vec[0] * (qboxes[j, k, 1] - boxes[i, l, 1])
                            if cross >= 0:
                                qbox_overlap_box = False
                                break
                        if not qbox_overlap_box:
                            break
                    if qbox_overlap_box:
                        ret[i, j] = True
                else:
                    ret[i, j] = True
    return ret


def test_box_collision_basic():
    # two overlapping boxes (proper edge crossings), one distant
    corners = box_np_ops.center_to_corner_box2d(
        np.array([[0.0, 0.0], [1.0, 0.5], [50.0, 50.0]]),
        np.array([[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]),
        np.array([0.0, 0.3, 0.3]),
    )
    col = box_np_ops.box_collision_test(corners, corners)
    assert col[0, 1] and col[1, 0]
    assert not col[0, 2] and not col[2, 0]
    # contained box (no edge intersections) still collides
    corners2 = box_np_ops.center_to_corner_box2d(
        np.array([[0.0, 0.0], [0.0, 0.0]]),
        np.array([[4.0, 4.0], [1.0, 1.0]]),
        np.array([0.0, 0.5]),
    )
    col2 = box_np_ops.box_collision_test(corners2[:1], corners2[1:])
    assert col2[0, 0]


def test_box_collision_matches_reference_kernel():
    rng = np.random.RandomState(7)
    centers = rng.uniform(-4, 4, (24, 2))
    dims = rng.uniform(0.5, 4, (24, 2))
    angles = rng.uniform(-np.pi, np.pi, 24)
    corners = box_np_ops.center_to_corner_box2d(centers, dims, angles)
    got = box_np_ops.box_collision_test(corners, corners)
    want = _reference_collision(corners, corners)
    np.testing.assert_array_equal(got, want)


def test_rotation_points_single_angle_inverse():
    rng = np.random.RandomState(2)
    pts = rng.randn(100, 3)
    rot = box_np_ops.rotation_points_single_angle(pts, 0.7, axis=2)
    back = box_np_ops.rotation_points_single_angle(rot, -0.7, axis=2)
    np.testing.assert_allclose(back, pts, atol=1e-12)
