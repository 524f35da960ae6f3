"""Rotated-BEV box overlap / IoU, fully on device (jnp, jit-safe).

TPU-native replacement for the reference CUDA extension `iou3d_nms_cuda`
(`det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu:236-279`, CPU mirror
`src/iou3d_cpu.cpp`). The CUDA code walks a Sutherland-Hodgman style polygon
clip per thread with data-dependent branches; here the intersection area of
two convex quads is computed with a fixed-size, branch-free formulation that
vectorizes over all box pairs:

  1. candidate vertices = corners of A inside B, corners of B inside A, and
     all 16 edge-pair intersection points (24 fixed slots, validity-masked);
  2. sort candidates by angle around the centroid of the valid set;
  3. shoelace fan area over the sorted valid prefix.

The intersection of two convex polygons is convex, so the angular sort plus
fan triangulation is exact up to floating point.

Box conventions mirror the reference wrappers
(`det3d/ops/iou3d_nms/iou3d_nms_utils.py:31-35`): det3d boxes
(x, y, z, w, l, h, yaw) are converted with ``to_pcdet`` — dims swapped and
heading mapped to ``-yaw - pi/2`` — before overlap math, so results are
comparable bit-for-bit in convention.
"""

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-8


def to_pcdet_bev(boxes):
    """det3d (..., 7+) [x, y, z, w, l, h, ..., yaw] -> pcdet BEV (..., 5)
    [x, y, dx, dy, heading]. Mirrors `iou3d_nms_utils.py:31-35`."""
    return jnp.stack(
        [
            boxes[..., 0],
            boxes[..., 1],
            boxes[..., 4],
            boxes[..., 3],
            -boxes[..., -1] - jnp.pi / 2,
        ],
        axis=-1,
    )


def box_corners_bev(boxes):
    """pcdet BEV boxes (..., 5) -> corners (..., 4, 2), CCW order."""
    x, y, dx, dy, r = (boxes[..., i] for i in range(5))
    cos_r = jnp.cos(r)
    sin_r = jnp.sin(r)
    # local corners, CCW: (+,+), (-,+), (-,-), (+,-)
    lx = jnp.stack([dx, -dx, -dx, dx], axis=-1) * 0.5
    ly = jnp.stack([dy, dy, -dy, -dy], axis=-1) * 0.5
    cx = lx * cos_r[..., None] - ly * sin_r[..., None] + x[..., None]
    cy = lx * sin_r[..., None] + ly * cos_r[..., None] + y[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _points_in_convex_quad(pts, quad):
    """pts (..., P, 2) inside CCW quad (..., 4, 2) -> bool (..., P)."""
    v0 = quad  # (..., 4, 2)
    v1 = jnp.roll(quad, -1, axis=-2)
    edge = v1 - v0  # (..., 4, 2)
    rel = pts[..., None, :, :] - v0[..., :, None, :]  # (..., 4, P, 2)
    cross = edge[..., :, None, 0] * rel[..., 1] - edge[..., :, None, 1] * rel[..., 0]
    return (cross >= -_EPS).all(axis=-2)


def _segment_intersections(a_quad, b_quad):
    """All 16 edge-pair intersection points between two quads.

    Returns pts (..., 16, 2) and valid (..., 16).
    """
    a0 = a_quad[..., :, None, :]  # (..., 4, 1, 2)
    a1 = jnp.roll(a_quad, -1, axis=-2)[..., :, None, :]
    b0 = b_quad[..., None, :, :]  # (..., 1, 4, 2)
    b1 = jnp.roll(b_quad, -1, axis=-2)[..., None, :, :]

    da = a1 - a0
    db = b1 - b0
    # solve a0 + t*da = b0 + u*db
    den = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    rel = b0 - a0
    t_num = rel[..., 0] * db[..., 1] - rel[..., 1] * db[..., 0]
    u_num = rel[..., 0] * da[..., 1] - rel[..., 1] * da[..., 0]
    safe_den = jnp.where(jnp.abs(den) < _EPS, 1.0, den)
    t = t_num / safe_den
    u = u_num / safe_den
    valid = (
        (jnp.abs(den) >= _EPS)
        & (t >= -_EPS) & (t <= 1 + _EPS)
        & (u >= -_EPS) & (u <= 1 + _EPS)
    )
    pts = a0 + t[..., None] * da
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(shape[:-1])


def _bitonic_sort_by_key(keys, vals):
    """Sort the last axis (power-of-two length) ascending by `keys`,
    permuting each array in `vals` identically.

    A fixed compare-exchange network (bitonic) instead of `jnp.argsort`:
    XLA's generic variadic sort over millions of tiny 32-wide rows lowers
    poorly on TPU. Each stage is expressed with reshapes + slices + selects
    only (a stride-j exchange pairs element (b, 0, t) with (b, 1, t) in the
    (..., n/2j, 2, j) view) — no gather ops, so it compiles to plain
    vector selects.
    """
    import numpy as np

    n = keys.shape[-1]
    assert (n & (n - 1)) == 0, "length must be a power of two"
    idx = np.arange(n)

    def stage(keys, vals, k, j):
        lead = keys.shape[:-1]
        view = lead + (n // (2 * j), 2, j)
        # ascending flag of the LOW slot of each pair
        asc_np = ((idx & k) == 0).reshape(n // (2 * j), 2, j)[:, 0, :]
        asc = jnp.asarray(asc_np)

        kv = keys.reshape(view)
        k_lo, k_hi = kv[..., 0, :], kv[..., 1, :]
        lo_first = k_lo <= k_hi
        take_lo = jnp.where(asc, lo_first, jnp.logical_not(lo_first))

        new_k_lo = jnp.where(take_lo, k_lo, k_hi)
        new_k_hi = jnp.where(take_lo, k_hi, k_lo)
        keys = jnp.stack([new_k_lo, new_k_hi], axis=-2).reshape(
            lead + (n,)
        )

        new_vals = []
        for v in vals:
            vv = v.reshape(view)
            v_lo, v_hi = vv[..., 0, :], vv[..., 1, :]
            nv_lo = jnp.where(take_lo, v_lo, v_hi)
            nv_hi = jnp.where(take_lo, v_hi, v_lo)
            new_vals.append(
                jnp.stack([nv_lo, nv_hi], axis=-2).reshape(lead + (n,))
            )
        return keys, new_vals

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            keys, vals = stage(keys, vals, k, j)
            j //= 2
        k *= 2
    return keys, vals


def _clipped_edge_integrals(poly, clip_quad):
    """Green's-theorem line integrals of `poly`'s edges clipped to the
    inside of convex `clip_quad`.

    For each directed edge x(t) = p + t*d, t in [0, 1], of `poly`, the
    portion inside the convex clip region is a single interval [t0, t1]
    (intersection of 4 half-plane constraints, each linear in t). The
    integral of (x dy - y dx)/2 along the clipped portion is
    cross(v0, v1)/2 with v0 = x(t0), v1 = x(t1). Summed over the closed
    boundary of A inter B these integrals give its exact area.

    Returns the per-pair sum of edge integrals (leading batch dims).
    """
    p = poly  # (..., 4, 2)
    q = jnp.roll(poly, -1, axis=-2)
    d = q - p

    c0 = clip_quad  # (..., 4, 2)
    c1 = jnp.roll(clip_quad, -1, axis=-2)
    e = c1 - c0  # CCW edge; inside = cross(e, x - c0) >= 0

    # alpha + t*beta >= 0 per (poly edge, clip plane): (..., 4poly, 4clip)
    rel = p[..., :, None, :] - c0[..., None, :, :]
    alpha = (e[..., None, :, 0] * rel[..., 1]
             - e[..., None, :, 1] * rel[..., 0])
    beta = (e[..., None, :, 0] * d[..., :, None, 1]
            - e[..., None, :, 1] * d[..., :, None, 0])

    big = jnp.asarray(1e9, poly.dtype)
    parallel = jnp.abs(beta) < _EPS
    safe_beta = jnp.where(parallel, 1.0, beta)
    bound = -alpha / safe_beta
    # beta > 0: t >= bound (lower); beta < 0: t <= bound (upper);
    # parallel: inside for all t if alpha >= 0 else empty (lower=+big)
    lower = jnp.where(
        parallel,
        jnp.where(alpha >= -_EPS, -big, big),
        jnp.where(beta > 0, bound, -big),
    )
    upper = jnp.where(
        parallel, big, jnp.where(beta > 0, big, bound)
    )

    t0 = jnp.maximum(lower.max(axis=-1), 0.0)  # (..., 4)
    t1 = jnp.minimum(upper.min(axis=-1), 1.0)
    keep = (t1 > t0).astype(poly.dtype)

    v0 = p + t0[..., None] * d
    v1 = p + t1[..., None] * d
    integ = 0.5 * (v0[..., 0] * v1[..., 1] - v0[..., 1] * v1[..., 0])
    return (integ * keep).sum(axis=-1)


# Relative enlargement of quad B before computing area(A ^ B+): boundary-
# collinear configurations (identical boxes, boxes sharing an edge) would
# otherwise double-count the shared boundary segment (the two-sided Green
# decomposition needs each boundary piece exactly once). With B+ strictly
# enlarged, A-edges collinear with B's boundary fall strictly inside B+
# (counted once, from A) and B+'s corresponding edges fall strictly outside A
# (counted never). Biases the overlap by O(eps * area) ~ 1e-5 — invisible to
# any IoU threshold.
_ENLARGE = 1e-5


def _scale_quad(quad, factor):
    center = quad.mean(axis=-2, keepdims=True)
    return center + (quad - center) * factor


def _convex_intersection_area(a_quad, b_quad):
    """Exact intersection area of two convex CCW quads, batched over leading
    dims, via the two-sided Green decomposition:

      area(A^B) = sum over edges of A clipped to B of I(edge)
                + sum over edges of B clipped to A of I(edge),
      I(v0 -> v1) = cross(v0, v1) / 2.

    Replaces the candidate-vertex + bitonic-sort formulation (same math as
    the reference polygon clip, `iou3d_nms_kernel.cu:236-279`) with ~15x
    fewer intermediates — no sort, no gather, MXU/VPU-friendly.
    Degenerate boundary-collinear cases are regularized by computing
    area(A ^ B+) with B+ = B enlarged by 1 + 1e-5 (see _ENLARGE).
    """
    b_plus = _scale_quad(b_quad, 1.0 + _ENLARGE)
    area = (_clipped_edge_integrals(a_quad, b_plus)
            + _clipped_edge_integrals(b_plus, a_quad))
    # exact upper bound: min of the two quad areas (shoelace)
    def _quad_area(qd):
        x, y = qd[..., 0], qd[..., 1]
        xn = jnp.roll(x, -1, axis=-1)
        yn = jnp.roll(y, -1, axis=-1)
        return 0.5 * jnp.abs((x * yn - y * xn).sum(axis=-1))

    cap = jnp.minimum(_quad_area(a_quad), _quad_area(b_quad))
    return jnp.clip(area, 0.0, cap)


def _convex_intersection_area_sorted(a_quad, b_quad):
    """Candidate-vertex + angular-sort formulation (round-1 path); kept as a
    second independent oracle for the clipping implementation above."""
    a_in_b = _points_in_convex_quad(a_quad, b_quad)  # (..., 4)
    b_in_a = _points_in_convex_quad(b_quad, a_quad)  # (..., 4)
    x_pts, x_valid = _segment_intersections(a_quad, b_quad)  # (..., 16, *)

    pts = jnp.concatenate([a_quad, b_quad, x_pts], axis=-2)  # (..., 24, 2)
    valid = jnp.concatenate([a_in_b, b_in_a, x_valid], axis=-1)  # (..., 24)

    num_valid = valid.sum(axis=-1, keepdims=True)  # (..., 1)
    vf = valid[..., None].astype(pts.dtype)
    centroid = (pts * vf).sum(axis=-2, keepdims=True) / jnp.maximum(
        num_valid[..., None], 1
    )
    # pseudo-angle: monotone in atan2 over (-pi, pi], no transcendentals
    dxc = pts[..., 0] - centroid[..., 0]
    dyc = pts[..., 1] - centroid[..., 1]
    r = jnp.abs(dxc) + jnp.abs(dyc) + _EPS
    p = 1.0 - dxc / r
    ang = jnp.where(dyc >= 0, p, -p)  # (-2, 2]

    # Packed-key sort: quantize the pseudo-angle and pack the candidate
    # index into the low 5 bits, so the bitonic network permutes ONE int32
    # array instead of three floats (the sort stages dominate HBM traffic).
    # Quantization step 4/2^20 ~ 4e-6 only reorders near-identical vertices —
    # no effect on the polygon area.
    q = jnp.clip(((ang + 2.0) * (1 << 20)).astype(jnp.int32), 0, (1 << 22))
    idx24 = jnp.arange(24, dtype=jnp.int32)
    # invalid candidates keep their index bits (sorted last, gather their
    # own — zero-valid — slot)
    key = jnp.where(valid, q * 32 + idx24, jnp.int32(2 ** 30) + idx24)

    # pad 24 -> 32 slots for the power-of-two network
    pad_shape = key.shape[:-1] + (8,)
    key = jnp.concatenate(
        [key, jnp.full(pad_shape, 2 ** 30 + 24, jnp.int32)
         + jnp.arange(8, dtype=jnp.int32)], -1
    )
    key, _ = _bitonic_sort_by_key(key, [])

    # gather sorted (x, y, valid) via one-hot contraction over the 32 slots
    idx_sorted = key % 32  # (..., 32)
    slots = jnp.arange(32, dtype=jnp.int32)
    onehot = (idx_sorted[..., :, None] == slots).astype(pts.dtype)
    onehot = onehot[..., :24]  # (..., 32, 24): padded slots gather nothing
    px = jnp.einsum("...kj,...j->...k", onehot, pts[..., 0])
    py = jnp.einsum("...kj,...j->...k", onehot, pts[..., 1])
    vl = jnp.einsum("...kj,...j->...k", onehot, valid.astype(pts.dtype))

    # fan triangulation from the first (valid) vertex over the sorted prefix
    dx = px - px[..., 0:1]
    dy = py - py[..., 0:1]
    cross = dx[..., :-1] * dy[..., 1:] - dy[..., :-1] * dx[..., 1:]
    tri_valid = vl[..., :-1] * vl[..., 1:]
    area = 0.5 * jnp.abs((cross * tri_valid).sum(axis=-1))
    return jnp.where(num_valid[..., 0] >= 3, area, 0.0)


# Row-chunk size for pairwise overlap: bounds the (chunk, M, 24, 2)
# candidate-vertex temporaries bounded (~400 MB peak at K=2048) while keeping
# the number of unrolled chunk subgraphs small for compile tractability.
_PAIRWISE_CHUNK = 512


# Pairwise-overlap backend: "pallas" evaluates the identical Green-clip math
# on (8, 128) pair tiles with all intermediates in registers (the XLA
# lowering is VPU-bound on materialized temporaries); "jnp" is the pure-XLA
# path; "auto" picks pallas on TPU. Override for experiments/debugging.
_OVERLAP_BACKEND = "auto"


def set_overlap_backend(name):
    global _OVERLAP_BACKEND
    assert name in ("auto", "jnp", "pallas")
    _OVERLAP_BACKEND = name


def _overlap_use_pallas():
    if _OVERLAP_BACKEND != "auto":
        return _OVERLAP_BACKEND == "pallas"
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def rotated_overlap_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV overlap area (N, M); pcdet BEV (.., 5) inputs.

    Equivalent of `boxes_overlap_kernel` (`iou3d_nms_kernel.cu`). The
    backend global is resolved HERE, outside the jit, so
    `set_overlap_backend` takes effect on the next call instead of being
    baked into a shape-keyed trace cache.
    """
    return _rotated_overlap_bev_jit(boxes_a, boxes_b,
                                    use_pallas=_overlap_use_pallas())


@partial(jax.jit, static_argnames=("use_pallas",))
def _rotated_overlap_bev_jit(boxes_a, boxes_b, use_pallas):
    ca = box_corners_bev(boxes_a)  # (N, 4, 2)
    cb = box_corners_bev(boxes_b)  # (M, 4, 2)
    n = ca.shape[0]
    m = cb.shape[0]

    if use_pallas and n >= 8 and m >= 128:
        from .pallas.iou_kernel import convex_intersection_area_pallas

        return convex_intersection_area_pallas(ca, cb)

    if n <= _PAIRWISE_CHUNK:
        a, b = jnp.broadcast_arrays(ca[:, None], cb[None, :])
        return _convex_intersection_area(a, b)

    nc = -(-n // _PAIRWISE_CHUNK)
    pad = nc * _PAIRWISE_CHUNK - n
    ca_p = jnp.pad(ca, ((0, pad), (0, 0), (0, 0)))
    ca_chunks = ca_p.reshape(nc, _PAIRWISE_CHUNK, 4, 2)

    # python-unrolled chunks: independent work in ONE compiled program
    # (lax.map serializes chunk launches — measured ~65 ms/launch of pure
    # dispatch overhead on the remote TPU backend)
    outs = []
    for i in range(nc):
        a, b = jnp.broadcast_arrays(ca_chunks[i][:, None], cb[None, :])
        outs.append(_convex_intersection_area(a, b))
    return jnp.concatenate(outs, axis=0)[:n]


def rotated_iou_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV IoU (N, M); pcdet BEV inputs (`iou_bev`).

    Not jitted itself (callers are; a jit here would re-bake the overlap
    backend choice into this function's own trace cache)."""
    overlap = rotated_overlap_bev(boxes_a, boxes_b)
    sa = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    sb = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    return overlap / jnp.maximum(sa + sb - overlap, _EPS)


def boxes_aligned_overlap_bev(boxes_a, boxes_b):
    """Row-aligned rotated BEV overlap (N,); pcdet BEV inputs."""
    ca = box_corners_bev(boxes_a)
    cb = box_corners_bev(boxes_b)
    return _convex_intersection_area(ca, cb)


def _height_overlap(za, ha, zb, hb):
    top = jnp.minimum(za + ha / 2, zb + hb / 2)
    bot = jnp.maximum(za - ha / 2, zb - hb / 2)
    return jnp.maximum(top - bot, 0.0)


def boxes_iou3d(boxes_a, boxes_b):
    """Pairwise 3D IoU (N, M); det3d 7-dim boxes (x,y,z,w,l,h,yaw).

    Mirrors `boxes_iou3d_gpu` (`iou3d_nms_utils.py:37-76`). Not jitted
    itself (see rotated_iou_bev).
    """
    bev_a = to_pcdet_bev(boxes_a)
    bev_b = to_pcdet_bev(boxes_b)
    overlaps_bev = rotated_overlap_bev(bev_a, bev_b)
    overlaps_h = _height_overlap(
        boxes_a[:, 2][:, None], boxes_a[:, 5][:, None],
        boxes_b[:, 2][None, :], boxes_b[:, 5][None, :],
    )
    overlaps_3d = overlaps_bev * overlaps_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlaps_3d / jnp.maximum(vol_a + vol_b - overlaps_3d, 1e-6)


@jax.jit
def boxes_aligned_iou3d(boxes_a, boxes_b):
    """Row-aligned 3D IoU (N,); det3d 7-dim boxes.

    Mirrors `boxes_aligned_iou3d_gpu` (`iou3d_nms_utils.py:78-116`) — the IoU
    target for the IoU-aware head (`models/losses/centernet_loss.py:86`).
    """
    bev_a = to_pcdet_bev(boxes_a)
    bev_b = to_pcdet_bev(boxes_b)
    overlaps_bev = boxes_aligned_overlap_bev(bev_a, bev_b)
    overlaps_h = _height_overlap(
        boxes_a[:, 2], boxes_a[:, 5], boxes_b[:, 2], boxes_b[:, 5]
    )
    overlaps_3d = overlaps_bev * overlaps_h
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return overlaps_3d / jnp.maximum(vol_a + vol_b - overlaps_3d, 1e-6)
