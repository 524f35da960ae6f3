"""Native C++ pipeline kernels vs numpy reference implementations."""

import numpy as np
import pytest

from pillarnet_lts_tpu import native
from pillarnet_lts_tpu.core.bbox import box_np_ops
from pillarnet_lts_tpu.core.target import center_target

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _pure_numpy_points_in_rbbox(points, rbbox):
    """Bypass the native dispatch inside box_np_ops."""
    centers = rbbox[:, :3]
    dims = rbbox[:, 3:6]
    angles = rbbox[:, -1]
    rel = points[:, None, :3] - centers[None]
    c, s = np.cos(angles), np.sin(angles)
    lx = rel[..., 0] * c - rel[..., 1] * s
    ly = rel[..., 0] * s + rel[..., 1] * c
    return (
        (np.abs(lx) <= dims[None, :, 0] / 2)
        & (np.abs(ly) <= dims[None, :, 1] / 2)
        & (np.abs(rel[..., 2]) <= dims[None, :, 2] / 2)
    )


def test_points_in_rbbox_native_matches_numpy():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-20, 20, (5000, 5)).astype(np.float32)
    boxes = np.concatenate(
        [
            rng.uniform(-10, 10, (32, 3)),
            rng.uniform(0.5, 5, (32, 3)),
            rng.uniform(-np.pi, np.pi, (32, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    got = native.points_in_rbbox(pts, boxes)
    want = _pure_numpy_points_in_rbbox(pts, boxes)
    np.testing.assert_array_equal(got, want)


def test_draw_gaussians_native_matches_numpy():
    rng = np.random.RandomState(1)
    H = W = 64
    n = 12
    centers = rng.uniform(2, 60, (n, 2)).astype(np.float32)
    radii = rng.randint(1, 8, n).astype(np.int32)

    want = np.zeros((H, W), np.float32)
    for i in range(n):
        center_target.draw_gaussian(want, centers[i], int(radii[i]))

    got = np.zeros((H, W), np.float32)
    assert native.draw_gaussians(got, centers, radii)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_transform_sweep_native_matches_numpy():
    rng = np.random.RandomState(2)
    pts = rng.randn(1000, 5).astype(np.float32)
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = box_np_ops.rotation_points_single_angle(
        np.eye(3), 0.4, axis=2
    ).T.astype(np.float32)
    tf[:3, 3] = [1.0, -2.0, 0.5]

    got = native.transform_sweep(pts, tf, 0.05)
    xyz1 = np.concatenate([pts[:, :3], np.ones((1000, 1), np.float32)], 1)
    want_xyz = (tf @ xyz1.T).T[:, :3]
    np.testing.assert_allclose(got[:, :3], want_xyz, atol=1e-4)
    np.testing.assert_allclose(got[:, 3:5], pts[:, 3:5])
    np.testing.assert_allclose(got[:, 5], 0.05)


def test_box_collision_native_matches_numpy_kernel():
    rng = np.random.RandomState(3)
    centers = rng.uniform(-6, 6, (40, 2))
    dims = rng.uniform(0.5, 4, (40, 2))
    angles = rng.uniform(-np.pi, np.pi, 40)
    corners = box_np_ops.center_to_corner_box2d(centers, dims, angles)
    got = native.box_collision_test(corners, corners)

    # numpy path (private helpers, skip native dispatch)
    su = box_np_ops.corner_to_standup_nd(corners)
    from tests.test_box_np_ops import _reference_collision

    want = _reference_collision(corners, corners)
    np.testing.assert_array_equal(got, want)
