"""Numpy box geometry (CPU data-pipeline side).

Behavioral contract follows the reference `det3d/core/bbox/box_np_ops.py`
(conventions: boxes = (x, y, z, w, l, h, [vx, vy,] yaw); yaw rotates corners
clockwise-positive via the ``rotation_2d`` matrix; lidar boxes use
origin (0.5, 0.5, 0.5) and rotation about z). Implementations here are
vectorized numpy — the reference's numba kernels (`box_np_ops.py:496-640`,
`geometry.py`) are replaced by broadcasting, which is faster for the
array sizes seen in the pipeline and removes the numba dependency.
"""

import numpy as np


def limit_period(val, offset=0.5, period=np.pi):
    """Wrap angles into one period (reference `box_np_ops.py:360`)."""
    return val - np.floor(val / period + offset) * period


def corners_nd(dims, origin=0.5):
    """Relative box corners from per-dim lengths (reference `box_np_ops.py:55`).

    2D layout is clockwise starting at the minimum corner:
    (x0y0, x0y1, x1y1, x1y0).
    """
    ndim = int(dims.shape[1])
    corners_norm = np.stack(
        np.unravel_index(np.arange(2 ** ndim), [2] * ndim), axis=1
    ).astype(dims.dtype)
    if ndim == 2:
        corners_norm = corners_norm[[0, 1, 3, 2]]
    elif ndim == 3:
        corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.array(origin, dtype=dims.dtype)
    return dims.reshape([-1, 1, ndim]) * corners_norm.reshape([1, 2 ** ndim, ndim])


def rotation_2d(points, angles):
    """Rotate 2D corner sets, clockwise for positive angle (`box_np_ops.py:207`)."""
    rot_sin = np.sin(angles)
    rot_cos = np.cos(angles)
    # rot_mat_T[j, k, a]: p_out = p @ [[cos, -sin], [sin, cos]]
    rot_mat_T = np.stack(
        [np.stack([rot_cos, -rot_sin]), np.stack([rot_sin, rot_cos])]
    )
    return np.einsum("aij,jka->aik", points, rot_mat_T)


def rotation_3d_in_axis(points, angles, axis=0):
    """Rotate [N, P, 3] point sets about one axis (`box_np_ops.py:146`)."""
    rot_sin = np.sin(angles)
    rot_cos = np.cos(angles)
    ones = np.ones_like(rot_cos)
    zeros = np.zeros_like(rot_cos)
    if axis == 1:
        rot_mat_T = np.stack(
            [
                np.stack([rot_cos, zeros, -rot_sin]),
                np.stack([zeros, ones, zeros]),
                np.stack([rot_sin, zeros, rot_cos]),
            ]
        )
    elif axis == 2 or axis == -1:
        rot_mat_T = np.stack(
            [
                np.stack([rot_cos, -rot_sin, zeros]),
                np.stack([rot_sin, rot_cos, zeros]),
                np.stack([zeros, zeros, ones]),
            ]
        )
    elif axis == 0:
        rot_mat_T = np.stack(
            [
                np.stack([ones, zeros, zeros]),
                np.stack([zeros, rot_cos, -rot_sin]),
                np.stack([zeros, rot_sin, rot_cos]),
            ]
        )
    else:
        raise ValueError("axis should be in range")
    return np.einsum("aij,jka->aik", points, rot_mat_T)


def rotation_points_single_angle(points, angle, axis=0):
    """Rotate [N, 3] points by a scalar angle (`box_np_ops.py:182`)."""
    rot_sin = np.sin(angle)
    rot_cos = np.cos(angle)
    if axis == 1:
        rot_mat_T = np.array(
            [[rot_cos, 0, -rot_sin], [0, 1, 0], [rot_sin, 0, rot_cos]],
            dtype=points.dtype,
        )
    elif axis == 2 or axis == -1:
        rot_mat_T = np.array(
            [[rot_cos, -rot_sin, 0], [rot_sin, rot_cos, 0], [0, 0, 1]],
            dtype=points.dtype,
        )
    elif axis == 0:
        rot_mat_T = np.array(
            [[1, 0, 0], [0, rot_cos, -rot_sin], [0, rot_sin, rot_cos]],
            dtype=points.dtype,
        )
    else:
        raise ValueError("axis should be in range")
    return points @ rot_mat_T


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    """(x, y, w, l, yaw) boxes -> [N, 4, 2] corners (`box_np_ops.py:265`)."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    corners += centers.reshape([-1, 1, 2])
    return corners


def center_to_corner_box3d(centers, dims, angles=None, origin=(0.5, 0.5, 0.5), axis=2):
    """3D boxes -> [N, 8, 3] corners (`box_np_ops.py:241`)."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis=axis)
    corners += centers.reshape([-1, 1, 3])
    return corners


def corner_to_standup_nd(boxes_corner):
    """Corners -> axis-aligned standup boxes [N, 2*ndim] (`box_np_ops.py:123`)."""
    return np.concatenate(
        [boxes_corner.min(axis=1), boxes_corner.max(axis=1)], axis=1
    )


def points_in_rbbox(points, rbbox, z_axis=2, origin=(0.5, 0.5, 0.5)):
    """Boolean [num_points, num_boxes] membership test (`box_np_ops.py:641`).

    Implemented via the canonical-frame test (rotate points into each box's
    frame) instead of the reference's surface/normal numba kernel — identical
    results for upright lidar boxes, fully vectorized. Dispatches to the
    native C++ kernel (csrc/pillar_pipeline.cpp) when built and the origin is
    the default centered one.
    """
    points = np.asarray(points)
    rbbox = np.asarray(rbbox)
    if rbbox.shape[0] == 0:
        return np.zeros((points.shape[0], 0), dtype=bool)
    assert z_axis == 2, "only lidar (z-up) boxes supported"

    if tuple(origin) == (0.5, 0.5, 0.5):
        try:
            from ...native import points_in_rbbox as _native_pir

            out = _native_pir(points, rbbox)
            if out is not None:
                return out
        except ImportError:
            pass
    centers = rbbox[:, :3]
    dims = rbbox[:, 3:6]
    angles = rbbox[:, -1]

    rel = points[:, None, :3] - centers[None, :, :]  # (P, N, 3)
    cos_t = np.cos(angles)
    sin_t = np.sin(angles)
    # Inverse of the corner rotation (p_out = p @ [[c,-s],[s,c]]):
    # canonical = rel @ [[c, s], [-s, c]]
    local_x = rel[..., 0] * cos_t - rel[..., 1] * sin_t
    local_y = rel[..., 0] * sin_t + rel[..., 1] * cos_t
    local_z = rel[..., 2]

    origin = np.array(origin, dtype=points.dtype)
    # shift so the box spans [-origin*d, (1-origin)*d] in each dim
    lo = -origin * dims
    hi = (1.0 - origin) * dims
    inside = (
        (local_x >= lo[None, :, 0]) & (local_x <= hi[None, :, 0])
        & (local_y >= lo[None, :, 1]) & (local_y <= hi[None, :, 1])
        & (local_z >= lo[None, :, 2]) & (local_z <= hi[None, :, 2])
    )
    return inside


def points_count_rbbox(points, rbbox, z_axis=2, origin=(0.5, 0.5, 0.5)):
    """Per-box point count (`box_np_ops.py:15`)."""
    indices = points_in_rbbox(points, rbbox, z_axis=z_axis, origin=origin)
    return indices.sum(axis=0)


def _cross2d(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _segments_intersect(a0, a1, b0, b1):
    """Vectorized proper segment intersection (strict), matching the reference
    orientation tests in `box_collision_test` (`core/sampler/preprocess.py:849`).
    """
    d1 = _cross2d(a0, a1, b0)
    d2 = _cross2d(a0, a1, b1)
    d3 = _cross2d(b0, b1, a0)
    d4 = _cross2d(b0, b1, a1)
    return ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))


def box_collision_test(boxes, qboxes, clockwise=True):
    """BEV corner-polygon collision matrix [N, K] between two corner sets.

    Vectorized re-derivation of the reference numba kernel
    (`core/sampler/preprocess.py:849-928`): two convex quads collide iff any
    edges intersect, or one contains a corner of the other.
    """
    N = boxes.shape[0]
    K = qboxes.shape[0]
    if N == 0 or K == 0:
        return np.zeros((N, K), dtype=bool)

    try:
        from ...native import box_collision_test as _native_bct

        out = _native_bct(boxes, qboxes)
        if out is not None:
            return out
    except ImportError:
        pass

    # standup-box prefilter
    b_su = corner_to_standup_nd(boxes)
    q_su = corner_to_standup_nd(qboxes)
    iw = np.minimum(b_su[:, None, 2], q_su[None, :, 2]) - np.maximum(
        b_su[:, None, 0], q_su[None, :, 0]
    )
    ih = np.minimum(b_su[:, None, 3], q_su[None, :, 3]) - np.maximum(
        b_su[:, None, 1], q_su[None, :, 1]
    )
    candidates = (iw > 0) & (ih > 0)

    slices = np.array([1, 2, 3, 0])
    # edge endpoints: (N, 4, 2) each
    b0, b1 = boxes, boxes[:, slices, :]
    q0, q1 = qboxes, qboxes[:, slices, :]

    # all edge pairs: (N, K, 4, 4)
    inter = _segments_intersect(
        b0[:, None, :, None, :],
        b1[:, None, :, None, :],
        q0[None, :, None, :, :],
        q1[None, :, None, :, :],
    )
    edge_hit = inter.any(axis=(2, 3))

    def _contains(polys, pts, cw):
        """polys (A, 4, 2) convex quads; pts (B, 4, 2): all-corners-inside
        test matching the reference's strict `cross >= 0 -> outside` rule."""
        # edge vector k -> k+1 reversed per reference (vec = -(c_k - c_{k+1}))
        vec = polys[:, slices, :] - polys  # c_{k+1} - c_k
        if not cw:
            vec = -vec
        # cross = vec.y * (c_k.x - p.x) - vec.x * (c_k.y - p.y) < 0 for inside
        dx = polys[:, None, :, None, 0] - pts[None, :, None, :, 0]
        dy = polys[:, None, :, None, 1] - pts[None, :, None, :, 1]
        cross = vec[:, None, :, None, 1] * dx - vec[:, None, :, None, 0] * dy
        # (A, B, 4 edges, 4 points): inside if every edge sees cross < 0
        inside_pt = (cross < 0).all(axis=2)  # (A, B, 4 points)
        return inside_pt.all(axis=2)  # all 4 points inside

    qin_b = _contains(boxes, qboxes, clockwise)  # (N, K)
    bin_q = _contains(qboxes, boxes, clockwise).T  # (K, N) -> (N, K)

    return candidates & (edge_hit | qin_b | bin_q)
