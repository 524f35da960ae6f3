"""Pallas TPU kernel: pairwise rotated-BEV suppression matrix for NMS.

The jnp rotated-IoU path (`ops/iou3d.py`) materializes (K, K, 32)-shaped
candidate tensors in HBM — ~0.4 s for the 6-task nuScenes predict. This
kernel tiles the K x K pair matrix (TILE x TILE per program), keeps every
intermediate in VMEM, and emits only the (K, K) suppression mask
M[i, j] = (i < j) & (IoU(i, j) > thresh) consumed by the greedy fixpoint.

Math is identical to `_convex_intersection_area`: 24 candidate vertices
(4 + 4 corners-inside + 16 edge intersections), angular bitonic sort, fan
shoelace — but laid out candidate-major ((32, TILE, TILE)) so the sorting
network's compare-exchange views only reshape leading axes, which Mosaic
lowers as cheap sublane ops.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..iou3d import box_corners_bev, to_pcdet_bev

_EPS = 1e-8
# Pair-matrix tile per program: TI rows x TJ cols. Kept small — the Mosaic
# compiler's memory footprint scales with the unrolled vector sizes and the
# remote compile helper gets OOM-killed on (32, 128*128) candidate tensors.
_TI = 16
_TJ = 128
_NSLOT = 32  # 24 candidates padded to a power of two



def _sum0(a):
    """Sum over the leading axis with unrolled adds (Mosaic cannot lower
    multi_reduction over the sublane axis to a 1-D result)."""
    acc = a[0]
    for i in range(1, a.shape[0]):
        acc = acc + a[i]
    return acc


def _suppress_kernel(ca_ref, cb_ref, meta_a_ref, meta_b_ref, out_ref, *,
                     thresh, ti, tj):
    # ca/cb: (T, 8) corner coords laid out [x0..x3, y0..y3] per row box
    # meta:  (T, 2) cols [area, global_index]
    tile = None  # unused; row/col tiles differ
    ax = [ca_ref[:, k] for k in range(4)]   # (TI,)
    ay = [ca_ref[:, 4 + k] for k in range(4)]
    bx = [cb_ref[:, k] for k in range(4)]   # (TJ,)
    by = [cb_ref[:, 4 + k] for k in range(4)]

    # pair-space broadcast helpers: A varies along rows, B along cols
    def A(v):
        return v[:, None]

    def B(v):
        return v[None, :]

    # 1) corners of A inside B (and vice versa), CCW half-plane tests.
    # All persistent masks are kept as f32 0/1 — Mosaic cannot lower stored
    # boolean vectors (i8 -> i1 trunc) at these shapes.
    def inside_tests(px_list, py_list, qx, qy, p_is_a):
        flags = []
        for p in range(4):
            ok = 1.0
            px = A(px_list[p]) if p_is_a else B(px_list[p])
            py = A(py_list[p]) if p_is_a else B(py_list[p])
            for e in range(4):
                e2 = (e + 1) % 4
                ex0 = B(qx[e]) if p_is_a else A(qx[e])
                ey0 = B(qy[e]) if p_is_a else A(qy[e])
                ex1 = B(qx[e2]) if p_is_a else A(qx[e2])
                ey1 = B(qy[e2]) if p_is_a else A(qy[e2])
                cross = (ex1 - ex0) * (py - ey0) - (ey1 - ey0) * (px - ex0)
                ok = ok * jnp.where(cross >= -_EPS, 1.0, 0.0)
            flags.append(ok)
        return flags  # 4 x (T, T) f32

    a_in_b = inside_tests(ax, ay, bx, by, True)
    b_in_a = inside_tests(bx, by, ax, ay, False)

    cand_x, cand_y, cand_v = [], [], []
    for p in range(4):
        cand_x.append(jnp.broadcast_to(A(ax[p]), (ti, tj)))
        cand_y.append(jnp.broadcast_to(A(ay[p]), (ti, tj)))
        cand_v.append(a_in_b[p])
    for p in range(4):
        cand_x.append(jnp.broadcast_to(B(bx[p]), (ti, tj)))
        cand_y.append(jnp.broadcast_to(B(by[p]), (ti, tj)))
        cand_v.append(b_in_a[p])

    # 2) 16 edge-pair intersections
    for i in range(4):
        i2 = (i + 1) % 4
        a0x, a0y = A(ax[i]), A(ay[i])
        dax, day = A(ax[i2]) - a0x, A(ay[i2]) - a0y
        for j in range(4):
            j2 = (j + 1) % 4
            b0x, b0y = B(bx[j]), B(by[j])
            dbx, dby = B(bx[j2]) - b0x, B(by[j2]) - b0y
            den = dax * dby - day * dbx
            rx, ry = b0x - a0x, b0y - a0y
            tn = rx * dby - ry * dbx
            un = rx * day - ry * dax
            safe = jnp.where(jnp.abs(den) < _EPS, 1.0, den)
            t = tn / safe
            u = un / safe
            ok = (
                jnp.where(jnp.abs(den) >= _EPS, 1.0, 0.0)
                * jnp.where(t >= -_EPS, 1.0, 0.0)
                * jnp.where(t <= 1 + _EPS, 1.0, 0.0)
                * jnp.where(u >= -_EPS, 1.0, 0.0)
                * jnp.where(u <= 1 + _EPS, 1.0, 0.0)
            )
            cand_x.append(a0x + t * dax)
            cand_y.append(a0y + t * day)
            cand_v.append(ok)

    # stack candidate-major and pad 24 -> 32; collapse the (T, T) pair grid
    # to one lane axis so every sort-stage tensor stays rank <= 3 (Mosaic
    # cannot lower rank-4 boolean vectors)
    tt = ti * tj
    px = jnp.stack(cand_x + [jnp.zeros((ti, tj))] * 8).reshape(_NSLOT, tt)
    py = jnp.stack(cand_y + [jnp.zeros((ti, tj))] * 8).reshape(_NSLOT, tt)
    vl = jnp.stack(
        [v * jnp.ones((ti, tj)) for v in cand_v]
        + [jnp.zeros((ti, tj))] * 8
    ).reshape(_NSLOT, tt)

    nv = _sum0(vl)  # (TT,)
    nv_safe = jnp.maximum(nv, 1.0)
    cx = _sum0(px * vl) / nv_safe
    cy = _sum0(py * vl) / nv_safe
    # pseudo-angle: monotone in atan2(dy, dx) over (-pi, pi], no
    # transcendentals (Mosaic has no atan2 lowering)
    dxc = px - cx[None]
    dyc = py - cy[None]
    r = jnp.abs(dxc) + jnp.abs(dyc) + _EPS
    p = 1.0 - dxc / r
    ang = jnp.where(dyc >= 0, p, -p)
    big = jnp.float32(1e9)
    key = jnp.where(vl > 0, ang, big)

    # 3) bitonic sort along the leading (candidate) axis
    def stage(key, px, py, vl, k, j):
        n = _NSLOT
        n2 = n // (2 * j)
        view = (n2, 2, j * tt)
        # ascending flag of each pair, from the low slot's global index
        # (computed with iota — pallas kernels cannot capture constants);
        # within a (2j)-block all low slots share (idx & k) for j < k, so the
        # flag depends only on the block index
        bb = jax.lax.broadcasted_iota(jnp.int32, (n2, 1), 0)
        asc = jnp.where(((bb * 2 * j) & k) == 0, 1.0, 0.0)  # (n2, 1) f32

        def split(a):
            a = a.reshape(view)
            return a[:, 0], a[:, 1]  # each (n2, j*TT)

        k_lo, k_hi = split(key)
        lo_first = jnp.where(k_lo <= k_hi, 1.0, 0.0)
        take_lo = asc * lo_first + (1.0 - asc) * (1.0 - lo_first)

        def merge(lo, hi):
            nlo = take_lo * lo + (1.0 - take_lo) * hi
            nhi = take_lo * hi + (1.0 - take_lo) * lo
            return jnp.stack([nlo, nhi], axis=1).reshape((n, tt))

        key = merge(k_lo, k_hi)
        x_lo, x_hi = split(px)
        px = merge(x_lo, x_hi)
        y_lo, y_hi = split(py)
        py = merge(y_lo, y_hi)
        v_lo, v_hi = split(vl)
        vl = merge(v_lo, v_hi)
        return key, px, py, vl

    k = 2
    while k <= _NSLOT:
        j = k // 2
        while j >= 1:
            key, px, py, vl = stage(key, px, py, vl, k, j)
            j //= 2
        k *= 2

    # 4) fan shoelace over the sorted valid prefix
    dx = px - px[0:1]
    dy = py - py[0:1]
    cross = dx[:-1] * dy[1:] - dy[:-1] * dx[1:]
    tri_valid = vl[:-1] * vl[1:]
    area = 0.5 * jnp.abs(_sum0(cross * tri_valid))
    area = jnp.where(nv >= 3.0, area, 0.0).reshape(ti, tj)

    sa = meta_a_ref[:, 0]
    sb = meta_b_ref[:, 0]
    union = jnp.maximum(A(sa) + B(sb) - area, _EPS)
    iou = area / union

    gi = meta_a_ref[:, 1]
    gj = meta_b_ref[:, 1]
    out_ref[:] = (
        jnp.where(iou > thresh, 1.0, 0.0)
        * jnp.where(A(gi) < B(gj), 1.0, 0.0)
    )


@functools.partial(jax.jit, static_argnames=("thresh",))
def suppression_matrix_pallas(boxes, thresh):
    """det3d boxes (K, 7+) -> (K, K) f32 mask M[i, j] = (i<j) & (iou > t).

    K is padded to a multiple of the tile internally.
    """
    K = boxes.shape[0]
    lcm = max(_TI, _TJ)
    kp = -(-K // lcm) * lcm
    bev = to_pcdet_bev(boxes)
    corners = box_corners_bev(bev)  # (K, 4, 2)
    areas = bev[:, 2] * bev[:, 3]

    # layout (Kp, 8): [x0..x3, y0..y3]; padded boxes get distant corners so
    # they never overlap anything
    cpack = jnp.concatenate(
        [corners[..., 0], corners[..., 1]], axis=1
    )  # (K, 8)
    cpack = jnp.concatenate(
        [cpack, jnp.full((kp - K, 8), 1e8)], axis=0
    )
    meta = jnp.stack(
        [
            jnp.concatenate([areas, jnp.ones(kp - K)]),
            jnp.arange(kp, dtype=jnp.float32),
        ],
        axis=1,
    )  # (Kp, 2)

    out = pl.pallas_call(
        functools.partial(_suppress_kernel, thresh=thresh, ti=_TI, tj=_TJ),
        grid=(kp // _TI, kp // _TJ),
        in_specs=[
            pl.BlockSpec((_TI, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TJ, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TI, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TJ, 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TI, _TJ), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kp, kp), jnp.float32),
    )(cpack, cpack, meta, meta)
    return out[:K, :K]
