"""Compact (gather-based) sparse-site machinery for the early BEV stages.

The reference runs conv1/conv2 as true sparse convolutions (spconv SubM /
SparseConv2d over an active-site list, `det3d/models/backbones/base.py:38-63`,
`PillarResNet.py:73-108`). The masked-dense formulation used elsewhere in
this repo burns >90% of its MXU work on empty sites at realistic 2-8%
occupancy — and block-level skipping does not help because a lidar sweep
touches 80%+ of (32, 32) blocks. This module is the site-level equivalent,
built TPU-first:

- active sites live in a COMPACT row table `(kmax, C)` sorted row-major by
  flat BEV id, padded to a static budget with a guaranteed zero sentinel
  row at index `kmax`;
- every irregular operation (neighbor lookup, occupancy dilation,
  densification) is expressed as a *branchless binary search into the
  sorted id table* + row gathers — no scatters, no host syncs, all static
  shapes;
- a SubM conv becomes `take(rows, nbr) -> (k, 9*Cin) @ (9*Cin, Cout)`: an
  im2col gather plus one MXU matmul over active rows only;
- BatchNorm over compact rows with the validity mask is *exactly* the
  reference's BN1d-over-sparse-features semantics (`base.py:122-130`).

Weight layout note: offset order everywhere is row-major (dy, dx) in
{-1,0,1}^2, matching `(3, 3, ci, co) -> (9*ci, co)` reshape of the dense
kernels, so compact and masked-dense execution share parameters.
"""

import jax
import jax.numpy as jnp


def searchsorted_left(table, queries, table_len=None):
    """Branchless leftmost binary search: first i with table[i] >= q.

    table: (n,) sorted ascending (int32); queries: any shape.
    Returns positions in [0, n]. `table_len` overrides n for the search
    depth (must be >= n).
    """
    n = table.shape[0] if table_len is None else table_len
    pos = jnp.zeros(queries.shape, jnp.int32)
    # first probe must be able to reach pos == n (query beyond every entry),
    # so start at the next power of two ABOVE n, halved
    step = 1
    while step < n + 1:
        step *= 2
    step //= 2
    while step > 0:
        probe = pos + step
        v = table[jnp.minimum(probe, n) - 1]
        pos = jnp.where((probe <= n) & (v < queries), probe, pos)
        step //= 2
    return pos


def lookup_ids(table, valid_n, queries, miss):
    """Exact-match lookup of `queries` in sorted `table` -> row index or
    `miss`. `valid_n` bounds the logically-valid prefix of `table` (padding
    rows must hold an id larger than any real query)."""
    pos = searchsorted_left(table, queries)
    hit = (table[jnp.minimum(pos, table.shape[0] - 1)] == queries) & (
        pos < valid_n
    )
    return jnp.where(hit, pos, miss)


def compact_ranks(flags):
    """Monotone-rank compaction without scatter: given (n,) bool flags,
    return (ranks, first_index) where ranks[i] = #flags[:i+1] and
    first_index(j) can be found by `searchsorted_left(ranks, j + 1)`."""
    return jnp.cumsum(flags.astype(jnp.int32))


def compact_segment_max(point_feats, flat_ids, valid, hw, kmax):
    """Sorted segment-max emitting COMPACT pillar rows (no dense grid).

    Replaces `scatter_max_kernel` + the dense materialization
    (`pillar_ops/src/scatter_ops_gpu.cu:13-45` + `.dense()`): sort points by
    pillar id, reverse segmented max scan (each run head carries its
    pillar's max), then extract the run heads — which are exactly the
    active sites sorted row-major.

    Args:
      point_feats: (N, C) post-MLP features.
      flat_ids: (N,) int32 in [0, hw]; hw = invalid sentinel.
      valid: (N,) bool.
      kmax: static active-site budget.
    Returns:
      rows: (kmax + 1, C) compact features; padding + sentinel rows are 0.
      site_ids: (kmax,) sorted flat ids of active sites; padding = hw.
      k_valid: () int32 number of active sites (clamped to kmax).
    """
    n, c = point_feats.shape
    neg = jnp.finfo(point_feats.dtype).min
    ids = jnp.where(valid, flat_ids, hw).astype(jnp.int32)
    order = jnp.argsort(ids)
    ids_s = ids[order]
    feats_s = jnp.where(valid[order][:, None], point_feats[order], neg)

    # reverse segmented max scan: run head ends with the segment max
    d = 1
    while d < n:
        same = jnp.concatenate([ids_s[d:] == ids_s[:-d], jnp.zeros((d,), bool)])
        shifted = jnp.concatenate(
            [feats_s[d:], jnp.full((d, c), neg, feats_s.dtype)]
        )
        feats_s = jnp.where(
            same[:, None], jnp.maximum(feats_s, shifted), feats_s
        )
        d *= 2

    head = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]]
    ) & (ids_s < hw)
    ranks = compact_ranks(head)  # ranks[i] = #heads in [0, i]
    k_valid = jnp.minimum(ranks[-1], kmax)

    # j-th run head is at the first position where ranks == j + 1
    slot = jnp.arange(kmax, dtype=jnp.int32)
    src = searchsorted_left(ranks, slot + 1)  # in [0, n]
    ok = slot < k_valid
    src_c = jnp.minimum(src, n - 1)
    site_ids = jnp.where(ok, ids_s[src_c], hw).astype(jnp.int32)
    vals = jnp.where(ok[:, None], feats_s[src_c], 0.0)
    rows = jnp.concatenate([vals, jnp.zeros((1, c), vals.dtype)], axis=0)
    return rows, site_ids, k_valid


def subm_neighbor_table(site_ids, k_valid, height, width, kmax):
    """(kmax, 9) neighbor row indices for a 3x3 SubM conv.

    Entry d = row-major offset (dy, dx); inactive / out-of-grid neighbors
    point at the zero sentinel row `kmax`. The x edges are checked via
    id % width so id +-1 cannot wrap across rows.
    """
    ys = site_ids // width
    xs = site_ids % width
    cols = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy = ys + dy
            xx = xs + dx
            inb = (yy >= 0) & (yy < height) & (xx >= 0) & (xx < width)
            q = jnp.where(inb, yy * width + xx, height * width)
            cols.append(lookup_ids(site_ids, k_valid, q, kmax))
    return jnp.stack(cols, axis=1).astype(jnp.int32)


def gather_conv(rows, nbr, weight, bias=None):
    """SubM conv on compact rows: im2col gather + one matmul.

    rows: (kmax + 1, Cin) with zero sentinel; nbr: (kmax, 9);
    weight: (9 * Cin, Cout) — row-major (dy, dx) offset order, i.e.
    `dense_kernel.reshape(9 * Cin, Cout)`.
    Returns (kmax, Cout).
    """
    cin = rows.shape[-1]
    g = jnp.take(rows, nbr, axis=0)  # (kmax, 9, Cin)
    y = g.reshape(nbr.shape[0], 9 * cin) @ weight
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def downsample_site_ids(site_ids, k_valid, height, width, k2max):
    """Active coarse sites after a k=3 s=2 p=1 SparseConv2d (spconv output
    rule: coarse (yo, xo) is active iff any fine site lies in the 3x3
    window centered at (2yo, 2xo)) — computed scatter-free.

    Returns (site_ids2, k2_valid) at the (height//2, width//2) grid,
    sorted row-major, padded with h2*w2.
    """
    h2, w2 = height // 2, width // 2
    hw2 = h2 * w2
    qy = jnp.arange(h2, dtype=jnp.int32)
    qx = jnp.arange(w2, dtype=jnp.int32)
    yy = qy[:, None] * 2  # fine center row per coarse row
    # a coarse cell is active iff one of the 3 fine rows has a site with
    # x in [2xo-1, 2xo+1]; per row that is an interval test on the sorted
    # ids: count = searchsorted(hi+1) - searchsorted(lo)
    occ = jnp.zeros((h2, w2), bool)
    for dy in (-1, 0, 1):
        ry = yy + dy  # (h2, 1)
        inb = (ry >= 0) & (ry < height)
        base = ry * width
        lo = base + jnp.maximum(qx[None, :] * 2 - 1, 0)
        hi = base + jnp.minimum(qx[None, :] * 2 + 1, width - 1)
        n_lo = searchsorted_left(site_ids, lo)
        n_hi = searchsorted_left(site_ids, hi + 1)
        occ = occ | (inb & (n_hi > n_lo) & (n_lo < k_valid))

    flat = occ.reshape(-1)
    ranks = compact_ranks(flat)
    k2_valid = jnp.minimum(ranks[-1], k2max)
    slot = jnp.arange(k2max, dtype=jnp.int32)
    src = searchsorted_left(ranks, slot + 1)
    ok = slot < k2_valid
    ids2 = jnp.where(ok, jnp.minimum(src, hw2 - 1), hw2).astype(jnp.int32)
    return ids2, k2_valid


def down_conv_neighbor_table(site_ids2, k2_valid, fine_site_ids, fine_k,
                             height, width, kmax_fine):
    """(k2max, 9) fine-row indices feeding each coarse output site of the
    strided conv: fine positions (2yo+dy, 2xo+dx), row-major offsets."""
    w2 = width // 2
    ys = (site_ids2 // w2) * 2
    xs = (site_ids2 % w2) * 2
    cols = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy = ys + dy
            xx = xs + dx
            inb = (yy >= 0) & (yy < height) & (xx >= 0) & (xx < width)
            q = jnp.where(inb, yy * width + xx, height * width)
            cols.append(lookup_ids(fine_site_ids, fine_k, q, kmax_fine))
    return jnp.stack(cols, axis=1).astype(jnp.int32)


def compact_to_dense(rows, site_ids, k_valid, height, width):
    """Materialize the dense (height, width, C) map + occupancy from compact
    rows — one binary search per grid position + one row gather (the same
    formulation as `voxelize.scatter_max_to_grid_sorted`, no scatter)."""
    kmax = site_ids.shape[0]
    q = jnp.arange(height * width, dtype=jnp.int32)
    pos = searchsorted_left(site_ids, q)
    hit = (site_ids[jnp.minimum(pos, kmax - 1)] == q) & (pos < k_valid)
    idx = jnp.where(hit, pos, kmax)  # sentinel row is zero
    grid = jnp.take(rows, idx, axis=0)
    return (
        grid.reshape(height, width, rows.shape[-1]),
        hit.reshape(height, width),
    )
