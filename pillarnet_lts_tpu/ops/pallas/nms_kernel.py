"""Pallas TPU kernel: pairwise rotated-BEV suppression matrix for NMS.

Replaces the reference CUDA greedy-NMS overlap kernel
(`det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu:280-390`). The jnp path
(`ops/iou3d.py`) materializes (K, K, 4, 4) clip temporaries in HBM (~19 ms
for the 6-task nuScenes predict); this kernel tiles the K x K pair matrix
(128 x 128 per program), keeps every intermediate in VMEM, and emits only
the (K, K) f32 suppression mask M[j, i] = (j < i) * (IoU(j, i) > thresh)
consumed by the greedy fixpoint matvec.

Math is identical to `iou3d._convex_intersection_area` (round-2 Green
decomposition): for each pair, the intersection area is the sum of
Green's-theorem line integrals of A's edges clipped to B+ and B+'s edges
clipped to A, with B+ = B enlarged by 1 + 1e-5 to regularize
boundary-collinear pairs. No sort, no gather — every op is an elementwise
(TILE, TILE) f32 vector op, which Mosaic lowers directly to VPU lanes.

The IoU threshold is a traced (1, 1) SMEM operand, so the same compiled
kernel serves both the static-threshold and the per-class dynamic-threshold
(grouped multi-class) paths, and vmap over tasks batches it.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..iou3d import _ENLARGE, box_corners_bev, to_pcdet_bev

_EPS = 1e-8
_BIG = 1e9
_TILE = 128


def _quad_area(xs, ys):
    """Shoelace area of a CCW quad given 4 x (T, 1)-ish coordinate vectors."""
    area = 0.0
    for k in range(4):
        k2 = (k + 1) % 4
        area = area + (xs[k] * ys[k2] - ys[k] * xs[k2])
    return 0.5 * area  # positive for CCW


def _clip_integrals(px, py, qx, qy, cx0, cy0, cx1, cy1):
    """Sum of Green line integrals of edges (p->q) clipped inside the convex
    region bounded by CCW edges (c0->c1). All inputs are lists of 4 pair-tile
    arrays (or broadcastable row/col vectors); output is a pair-tile array."""
    total = 0.0
    for e in range(4):
        dx = qx[e] - px[e]
        dy = qy[e] - py[e]
        t0 = jnp.float32(0.0)
        t1 = jnp.float32(1.0)
        empty = jnp.float32(0.0)  # 1.0 when a parallel plane excludes the edge
        for c in range(4):
            ex = cx1[c] - cx0[c]
            ey = cy1[c] - cy0[c]
            alpha = ex * (py[e] - cy0[c]) - ey * (px[e] - cx0[c])
            beta = ex * dy - ey * dx
            par = jnp.abs(beta) < _EPS
            bound = -alpha / jnp.where(par, 1.0, beta)
            is_lower = beta > 0
            lo = jnp.where(par | ~is_lower, -_BIG, bound)
            hi = jnp.where(par | is_lower, _BIG, bound)
            t0 = jnp.maximum(t0, lo)
            t1 = jnp.minimum(t1, hi)
            empty = jnp.maximum(
                empty, jnp.where(par & (alpha < -_EPS), 1.0, 0.0)
            )
        keep = jnp.where((t1 > t0) & (empty < 0.5), 1.0, 0.0)
        v0x = px[e] + t0 * dx
        v0y = py[e] + t0 * dy
        v1x = px[e] + t1 * dx
        v1y = py[e] + t1 * dy
        total = total + keep * 0.5 * (v0x * v1y - v0y * v1x)
    return total


def _suppress_kernel(thresh_ref, ca_ref, cb_ref, out_ref):
    """One (TILE, TILE) tile of M[j, i] = (j < i) * (IoU > thresh).

    ca: (TILE, 8) row-box corners [x0..x3, y0..y3] (quad A, as-is).
    cb: (TILE, 8) col-box corners, pre-enlarged by 1 + _ENLARGE (quad B+).
    """
    thresh = thresh_ref[0, 0]

    # row quantities broadcast along columns, col quantities along rows
    ax = [ca_ref[:, k][:, None] for k in range(4)]
    ay = [ca_ref[:, 4 + k][:, None] for k in range(4)]
    bx = [cb_ref[:, k][None, :] for k in range(4)]
    by = [cb_ref[:, 4 + k][None, :] for k in range(4)]

    def nxt(v):
        return v[1:] + v[:1]

    inter = _clip_integrals(ax, ay, nxt(ax), nxt(ay), bx, by, nxt(bx),
                            nxt(by))
    inter = inter + _clip_integrals(bx, by, nxt(bx), nxt(by), ax, ay,
                                    nxt(ax), nxt(ay))

    area_a = _quad_area(ax, ay)  # (T, 1)
    area_b = _quad_area(bx, by) / (1.0 + _ENLARGE) ** 2  # undo enlargement
    inter = jnp.clip(inter, 0.0, jnp.minimum(area_a, area_b))
    iou = inter / jnp.maximum(area_a + area_b - inter, _EPS)

    # global j < i ordering mask (rows suppress later columns)
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    rows = (jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0)
            + ti * _TILE)
    cols = (jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1)
            + tj * _TILE)
    out_ref[:, :] = jnp.where((rows < cols) & (iou > thresh), 1.0, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def suppression_matrix_pallas(boxes, thresh, interpret=False):
    """(K, D>=7) det3d boxes (score-descending) -> (K, K) f32 suppression
    matrix M[j, i] = (j < i) * (IoU_bev(j, i) > thresh).

    thresh may be a python float or a traced scalar (per-class dynamic NMS).
    K is padded to a multiple of 128 internally; padded rows have zero-area
    quads and never suppress anything (IoU 0).
    """
    k = boxes.shape[0]
    bev = to_pcdet_bev(boxes.astype(jnp.float32))
    corners = box_corners_bev(bev)  # (K, 4, 2)
    center = corners.mean(axis=-2, keepdims=True)
    corners_plus = center + (corners - center) * (1.0 + _ENLARGE)

    def pack(c):
        return jnp.concatenate([c[..., 0], c[..., 1]], axis=-1)  # (K, 8)

    kp = -(-k // _TILE) * _TILE
    ca = jnp.pad(pack(corners), ((0, kp - k), (0, 0)))
    cb = jnp.pad(pack(corners_plus), ((0, kp - k), (0, 0)))
    thresh_arr = jnp.asarray(thresh, jnp.float32).reshape(1, 1)

    grid = (kp // _TILE, kp // _TILE)
    out = pl.pallas_call(
        _suppress_kernel,
        out_shape=jax.ShapeDtypeStruct((kp, kp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(thresh_arr, ca, cb)
    return out[:k, :k]
