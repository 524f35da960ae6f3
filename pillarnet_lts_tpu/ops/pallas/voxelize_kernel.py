"""Pallas TPU kernel: pillar scatter-max into the dense BEV grid.

Replaces the XLA scatter lowering of `jax.ops.segment_max` for the
voxelization hot path (reference CUDA equivalent: `scatter_max_kernel`,
`det3d/ops/pillar_ops/src/scatter_ops_gpu.cu:13-45`). XLA's TPU scatter
serializes row updates through HBM; this kernel instead:

  1. sorts points by pillar id (XLA sort, outside the kernel),
  2. splits the BEV grid into row-band tiles whose feature block fits VMEM,
  3. per tile, streams the tile's point slice HBM->VMEM in fixed chunks
     (bounds from a scalar-prefetched searchsorted table) and runs the
     max-reduction as VMEM row read-modify-writes.

All writes for one tile stay in VMEM until the block is complete, so HBM
sees exactly one write per output row. An extra all-ones feature column
carries occupancy, so a single buffer serves both outputs and empty pillars
are detected without sentinel comparisons on real features.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points are streamed in chunks of this many rows
_CHUNK = 1024


def _kernel(tile_starts_ref, ids_ref, feats_ref, grid_ref,
            feats_vmem, ids_smem, sem, *, tile_pillars, neg_fill):
    t = pl.program_id(0)
    base = t * tile_pillars

    grid_ref[:] = jnp.full_like(grid_ref, neg_fill)

    start = tile_starts_ref[t]
    end = tile_starts_ref[t + 1]
    # chunk-align the stream start so every DMA offset is provably a
    # multiple of _CHUNK (Mosaic requires tile-aligned dynamic slices);
    # out-of-tile points picked up by the widened window are rejected by
    # the local-range guard below.
    astart = (start // _CHUNK) * _CHUNK
    n = end - astart
    num_chunks = (n + _CHUNK - 1) // _CHUNK

    def chunk_body(ci, _):
        offs = pl.multiple_of(astart + ci * _CHUNK, _CHUNK)
        copy_f = pltpu.make_async_copy(
            feats_ref.at[pl.ds(offs, _CHUNK), :], feats_vmem, sem.at[0],
        )
        copy_i = pltpu.make_async_copy(
            ids_ref.at[pl.ds(offs, _CHUNK)], ids_smem, sem.at[1],
        )
        copy_f.start()
        copy_i.start()
        copy_f.wait()
        copy_i.wait()

        def point_body(j, _):
            local = ids_smem[j] - base

            @pl.when((local >= 0) & (local < tile_pillars))
            def _():
                row = grid_ref[pl.ds(local, 1), :]
                upd = feats_vmem[pl.ds(j, 1), :]
                grid_ref[pl.ds(local, 1), :] = jnp.maximum(row, upd)
            return 0

        jax.lax.fori_loop(0, _CHUNK, point_body, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pillar_scatter_max_pallas(point_feats, flat_ids, valid, height, width,
                              tile_rows=8):
    """(B, N, C) features + (B, N) pillar ids (HW = dropped) ->
    (B, H, W, C) grid, (B, H, W) occupancy. Matches
    `ops.voxelize.scatter_max_to_grid` semantics (empty pillars -> 0).

    Differentiable via a custom VJP: the gradient of a pillar's max routes to
    the point(s) attaining it (the CUDA reference stores an argmax for the
    same purpose, `scatter_ops_gpu.cu:24-45`; ties receive duplicated
    gradient here — measure-zero for continuous features)."""
    return _scatter_fwd_impl(point_feats, flat_ids, valid, height, width,
                             tile_rows)


def _scatter_fwd_impl(point_feats, flat_ids, valid, height, width, tile_rows):
    out_dtype = point_feats.dtype
    # the kernel's single-row VMEM read-modify-writes require the fp32
    # (8, 128) sublane tiling; scatter in fp32 and cast the grid back
    point_feats = point_feats.astype(jnp.float32)

    B, N, C = point_feats.shape
    hw = height * width
    tile_pillars = tile_rows * width
    num_tiles = -(-height // tile_rows)
    padded_pillars = num_tiles * tile_pillars
    neg_fill = float(jnp.finfo(point_feats.dtype).min)
    # HBM DMA slices need the lane (last) dimension 128-aligned; the
    # occupancy column rides in slot C, the remainder is padding
    c_pad = max(128, -(-(C + 1) // 128) * 128)

    def one(feats, ids, ok):
        ids = jnp.where(ok, ids, hw).astype(jnp.int32)
        order = jnp.argsort(ids)
        sorted_ids = ids[order]
        # occupancy rides along as an extra all-ones column
        aug = jnp.concatenate(
            [
                feats[order],
                jnp.ones((N, 1), feats.dtype),
                jnp.zeros((N, c_pad - C - 1), feats.dtype),
            ],
            axis=-1,
        )
        aug = jnp.where(ok[order][:, None], aug, neg_fill)

        # pad so chunk DMAs never run off the end; padded ids point at a
        # scratch pillar range beyond every tile (dropped)
        sorted_ids = jnp.concatenate(
            [sorted_ids, jnp.full((_CHUNK,), hw, jnp.int32)]
        )
        aug = jnp.concatenate(
            [aug, jnp.full((_CHUNK, c_pad), neg_fill, feats.dtype)]
        )

        tile_bounds = (
            jnp.arange(num_tiles + 1, dtype=jnp.int32) * tile_pillars
        )
        tile_starts = jnp.searchsorted(
            sorted_ids[:N], tile_bounds, side="left"
        ).astype(jnp.int32)

        grid = pl.pallas_call(
            partial(_kernel, tile_pillars=tile_pillars, neg_fill=neg_fill),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(num_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),  # sorted ids
                    pl.BlockSpec(memory_space=pl.ANY),  # sorted feats+occ
                ],
                out_specs=pl.BlockSpec(
                    (tile_pillars, c_pad), lambda t, *_: (t, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((_CHUNK, c_pad), point_feats.dtype),
                    pltpu.SMEM((_CHUNK,), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (padded_pillars, c_pad), feats.dtype
            ),
        )(tile_starts, sorted_ids, aug)

        occ = grid[:hw, C] > 0.0
        out = jnp.where(occ[:, None], grid[:hw, :C], 0.0).astype(out_dtype)
        return out.reshape(height, width, C), occ.reshape(height, width)

    return jax.vmap(one)(point_feats, flat_ids, valid)


# ---------------------------------------------------------------------------
# MXU variant: one-hot matmul materialization.
#
# The scalar-loop kernel above performs one predicated VMEM row RMW per point
# (~262k sequential iterations, ~23 ms/frame). This variant restructures the
# problem so the MXU does the scatter:
#
#   1. XLA side: sort by pillar id, then a reverse segmented max scan
#      (log2(N) vectorized shift+select passes) leaves the FIRST row of every
#      equal-id run holding the max over the run; all other rows are zeroed.
#      Each pillar now appears exactly once => max-pool == sum.
#   2. Kernel: per BEV row-band tile, stream the tile's (chunk-aligned)
#      sorted point window and accumulate
#          out[p, c] += sum_j onehot[p, j] * feats[j, c]
#      as a (tile_pillars x CHUNK) @ (CHUNK x C) matmul, where
#      onehot[p, j] = (ids[j] == base + p). Stray rows from the chunk-aligned
#      window match nothing; zeroed non-head rows contribute nothing.
#
# ~0.3-0.5 TFLOP of bf16 matmul replaces the serial loop entirely.
# ---------------------------------------------------------------------------

# round-4 interleaved sweep (tools/bench_r4_probe.py phase3, xla-dedup
# slim kernel): 256 beats 512 by ~0.7-1.3 ms at the 262k -> 1440^2 x 32
# workload in every same-round comparison — the smaller chunk wastes less
# matmul width on tiles that own only a few hundred points; tile_rows is
# flat (1/2/4) under the slim kernel.
_MXU_CHUNK = 256


def _mxu_kernel(tile_starts_ref, ids_ref, feats_ref, grid_ref,
                feats_vmem, ids_vmem, sem, *, tile_pillars, occ_col,
                id_col, dot_dtype, nonneg=False):
    t = pl.program_id(0)
    base = t * tile_pillars

    grid_ref[:] = jnp.zeros_like(grid_ref)

    start = tile_starts_ref[t]
    end = tile_starts_ref[t + 1]
    astart = (start // _MXU_CHUNK) * _MXU_CHUNK
    num_chunks = (end - astart + _MXU_CHUNK - 1) // _MXU_CHUNK

    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_pillars, _MXU_CHUNK), 0)
        + base
    )
    c_pad = feats_vmem.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)
    id_lane = (lane == id_col).astype(jnp.float32)
    occ_lane = (lane == occ_col).astype(jnp.float32)

    def start_copies(ci, slot):
        offs = pl.multiple_of(astart + ci * _MXU_CHUNK, _MXU_CHUNK)
        gi = offs // _MXU_CHUNK
        g0 = (gi // 8) * 8  # HBM sublane slices must be 8-aligned
        pltpu.make_async_copy(
            feats_ref.at[pl.ds(offs, _MXU_CHUNK), :],
            feats_vmem.at[slot], sem.at[2 * slot],
        ).start()
        pltpu.make_async_copy(
            ids_ref.at[pl.ds(g0, 8), :], ids_vmem.at[slot],
            sem.at[2 * slot + 1],
        ).start()

    @pl.when(num_chunks > 0)
    def _():
        start_copies(0, 0)

    def chunk_body(ci, _):
        offs = pl.multiple_of(astart + ci * _MXU_CHUNK, _MXU_CHUNK)
        gi = offs // _MXU_CHUNK
        g0 = (gi // 8) * 8
        slot = jax.lax.rem(ci, 2)
        pltpu.make_async_copy(
            feats_ref.at[pl.ds(offs, _MXU_CHUNK), :],
            feats_vmem.at[slot], sem.at[2 * slot],
        ).wait()
        pltpu.make_async_copy(
            ids_ref.at[pl.ds(g0, 8), :], ids_vmem.at[slot],
            sem.at[2 * slot + 1],
        ).wait()

        # double buffering: next chunk's DMA overlaps this chunk's compute
        @pl.when(ci + 1 < num_chunks)
        def _():
            start_copies(ci + 1, 1 - slot)

        vals = feats_vmem[slot]  # (CHUNK, c_pad) fp32
        # pillar id per row, extracted as a lane-masked reduction
        idc = (vals * id_lane).sum(axis=1, keepdims=True)  # (CHUNK, 1)

        # chunk-local segmented suffix max over equal-id runs (points are
        # globally sorted, so runs are contiguous); the first row of each
        # local run ends up holding the run max
        d = 1
        while d < _MXU_CHUNK:
            same = idc == jnp.concatenate(
                [idc[d:], jnp.full((d, 1), -1.0, idc.dtype)], axis=0
            )
            shifted = jnp.concatenate(
                [vals[d:], jnp.zeros((d, c_pad), vals.dtype)], axis=0
            )
            vals = jnp.where(same, jnp.maximum(vals, shifted), vals)
            d *= 2
        prev = jnp.concatenate(
            [jnp.full((1, 1), -1.0, idc.dtype), idc[:-1]], axis=0
        )
        vals = jnp.where(idc != prev, vals, 0.0)  # non-heads drop out

        row = ids_vmem[slot, pl.ds(gi - g0, 1), :]  # (1, CHUNK) int32
        onehot = (row == row_ids).astype(dot_dtype)
        contrib = jax.lax.dot_general(
            onehot, vals.astype(dot_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # fp32 inputs must not round through bf16 MXU passes: the grid
            # values feed an exact-match winner test in the VJP
            precision=(jax.lax.Precision.HIGHEST
                       if dot_dtype == jnp.float32 else
                       jax.lax.Precision.DEFAULT),
        )
        if nonneg:
            # caller guarantees features >= 0 (post-ReLU PFE): untouched
            # contrib rows are 0 == the zero init, so a single plain max
            # pass replaces the 5-pass touched/seen gating below
            grid_ref[:] = jnp.maximum(grid_ref[:], contrib.astype(
                grid_ref.dtype))
            return 0
        # a pillar appears at most once per chunk; combine chunks by max,
        # gated on occupancy columns: rows the chunk does not touch stay
        # put, a row's FIRST touch replaces the zero-init (the true max may
        # be negative), later touches max-combine
        touched = (contrib * occ_lane).sum(axis=1, keepdims=True) > 0.0
        cur = grid_ref[:]
        contrib = contrib.astype(cur.dtype)
        seen = (cur.astype(jnp.float32) * occ_lane).sum(
            axis=1, keepdims=True
        ) > 0.0
        upd = jnp.where(seen, jnp.maximum(cur, contrib), contrib)
        grid_ref[:] = jnp.where(touched, upd, cur)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _mxu_kernel_cg(tbl_ref, ids_ref, feats_ref, grid_ref, *, tile_pillars,
                   occ_col, id_col, dot_dtype, nonneg, pack=1):
    """Chunk-scheduled variant: ONE point chunk per grid step.

    The tile-scheduled kernel (`_mxu_kernel`) runs a manual double-buffered
    chunk loop inside each of ~720 tile steps; most tiles hold only 1-2
    chunks, so the loop prologue/epilogue and semaphore waits dominate.
    Here the Pallas grid IS the chunk schedule: a scalar-prefetched table
    maps slot -> (tile, chunk row, first-visit, valid); consecutive slots
    of one tile revisit the same output block (Pallas keeps it resident in
    VMEM and flushes on index change), and input chunks are pipelined by
    the normal BlockSpec machinery instead of hand-rolled DMA.

    `pack` > 1 folds `pack` consecutive pillars into one output row (each
    pillar's payload pre-placed at lane offset (C+1)*(pillar %% pack) on the
    XLA side): the one-hot routes pillar//pack, shrinking both the one-hot
    materialization and the output grid by `pack`x. Requires `nonneg` (the
    occupancy-gated combine is per-row, which is wrong across lane groups).

    Measured-and-rejected as a perf lever (kept tested, default pack=1):
    at the flagship 262k -> 1440^2 x 32 workload, pack=3 is bit-equal but
    ~4.5 ms SLOWER end-to-end (13.4 -> 17.9 ms on-chip). Isolated timing
    pins ~4.9 ms on the lane-unaligned unfold epilogue (slices at offsets
    33/66) and ~0.4 ms of actual kernel-side gain — i.e. the kernel is not
    one-hot- or grid-traffic-bound, so shrinking both buys nothing.
    """
    s = pl.program_id(0)
    t = tbl_ref[0, s]
    g = tbl_ref[1, s]
    first = tbl_ref[2, s]
    v = tbl_ref[3, s]

    @pl.when(first == 1)
    def _():
        grid_ref[:] = jnp.zeros_like(grid_ref)

    @pl.when(v == 1)
    def _():
        vals = feats_ref[:]  # (CHUNK, c_pad) fp32, auto-pipelined
        c_pad = vals.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)
        id_lane = (lane == id_col).astype(jnp.float32)
        occ_lane = (lane == occ_col).astype(jnp.float32)
        idc = (vals * id_lane).sum(axis=1, keepdims=True)

        # chunk-local segmented suffix max (see _mxu_kernel)
        d = 1
        while d < _MXU_CHUNK:
            same = idc == jnp.concatenate(
                [idc[d:], jnp.full((d, 1), -1.0, idc.dtype)], axis=0
            )
            shifted = jnp.concatenate(
                [vals[d:], jnp.zeros((d, c_pad), vals.dtype)], axis=0
            )
            vals = jnp.where(same, jnp.maximum(vals, shifted), vals)
            d *= 2
        prev = jnp.concatenate(
            [jnp.full((1, 1), -1.0, idc.dtype), idc[:-1]], axis=0
        )
        vals = jnp.where(idc != prev, vals, 0.0)

        row = ids_ref[pl.ds(jax.lax.rem(g, 8), 1), :]  # (1, CHUNK) int32
        rows_per_tile = tile_pillars // pack
        if pack > 1:
            row = row // pack
        row_ids = (
            jax.lax.broadcasted_iota(
                jnp.int32, (rows_per_tile, _MXU_CHUNK), 0
            )
            + t * rows_per_tile
        )
        onehot = (row == row_ids).astype(dot_dtype)
        contrib = jax.lax.dot_general(
            onehot, vals.astype(dot_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if dot_dtype == jnp.float32 else
                       jax.lax.Precision.DEFAULT),
        )
        if nonneg:
            grid_ref[:] = jnp.maximum(
                grid_ref[:], contrib.astype(grid_ref.dtype)
            )
        else:
            touched = (contrib * occ_lane).sum(axis=1, keepdims=True) > 0.0
            cur = grid_ref[:]
            contrib_c = contrib.astype(cur.dtype)
            seen = (cur.astype(jnp.float32) * occ_lane).sum(
                axis=1, keepdims=True
            ) > 0.0
            upd = jnp.where(seen, jnp.maximum(cur, contrib_c), contrib_c)
            grid_ref[:] = jnp.where(touched, upd, cur)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pillar_scatter_max_mxu(point_feats, flat_ids, valid, height, width,
                           tile_rows=2, nonneg=False, pack=1):
    """Same contract as `pillar_scatter_max_pallas`, MXU-matmul backend.

    `nonneg=True` asserts every valid feature is >= 0 (true for post-ReLU
    PFE features); the kernel then combines chunks with one plain max pass
    instead of occupancy-gated selects (measured 14.6 -> see ROADMAP).

    `pack` > 1 (requires nonneg) lane-packs `pack` consecutive pillars per
    output row — see `_mxu_kernel_cg`; needs pack*(C+1)+2 <= 128 lanes and
    tile_rows*width divisible by pack."""
    return _scatter_mxu_impl(point_feats, flat_ids, valid, height, width,
                             tile_rows, nonneg, pack)


# schedule selector for the MXU scatter: 'tile' = per-tile chunk loop
# (`_mxu_kernel`), 'chunk' = chunk-parallel grid with output revisiting
# (`_mxu_kernel_cg`). Module-level so benchmarks can A/B it. 'chunk' is
# the default: same-session A/B measures 12.5 vs 14.4 ms for the 262k ->
# 1440^2 x 32 workload (most tiles hold 1-2 chunks, so the tile loop's
# prologue/DMA waits dominate it); sweeping tile_rows/_MXU_CHUNK under
# 'chunk' is flat within the ~1.5 ms relay run-to-run variance.
_MXU_SCHED = "chunk"


def set_mxu_schedule(name):
    global _MXU_SCHED
    assert name in ("tile", "chunk")
    _MXU_SCHED = name


# dedup (chunk-local segmented suffix max) placement for the 'chunk'
# schedule: 'xla' runs it over the whole sorted array on the XLA side
# before the kernel; 'kernel' keeps the round-3 in-kernel scan. The
# round-4 probe decomposition (tools/bench_r4_probe.py) showed the
# in-kernel scan is the kernel's dominant cost — ~4.7 ms of the 7.4 ms
# kernel time at the 262k -> 1440^2 x 32 workload (Mosaic lowers the
# 9 unaligned-sublane shift passes poorly), while the same passes as
# XLA elementwise ops over the (chunks, CHUNK, lanes) view cost ~1 ms.
# 'xla' also slims the kernel payload: no id/key lanes, bf16 stream for
# bf16 inputs (the scan needs the ids as a separate int32 array, not as
# payload lanes, and nothing downstream needs fp32 exactness anymore).
_MXU_DEDUP = "xla"


def set_mxu_dedup(name):
    global _MXU_DEDUP
    assert name in ("xla", "kernel")
    _MXU_DEDUP = name


def _chunk_dedup_xla(aug, sorted_key, chunk):
    """Chunk-local segmented suffix max + head-zeroing, XLA side.

    aug: (M, c_pad) sorted payload rows (M a multiple of `chunk`);
    sorted_key: (M,) int32 sorted pillar ids (invalid/pad rows -> hw).
    Returns aug with the FIRST row of every equal-key run inside each
    chunk holding the elementwise max over the run and every other row of
    the run zeroed — so the kernel's one-hot SUM equals the per-pillar max
    within a chunk (cross-chunk runs are max-combined by the kernel)."""
    m, c_pad = aug.shape
    nc = m // chunk
    v = aug.reshape(nc, chunk, c_pad)
    k3 = sorted_key.reshape(nc, chunk, 1)
    kfill = jnp.full((nc, 1, 1), -1, k3.dtype)
    d = 1
    while d < chunk:
        knext = jnp.concatenate(
            [k3[:, d:], jnp.broadcast_to(kfill, (nc, d, 1))], axis=1
        )
        vnext = jnp.concatenate(
            [v[:, d:], jnp.zeros((nc, d, c_pad), v.dtype)], axis=1
        )
        v = jnp.where(k3 == knext, jnp.maximum(v, vnext), v)
        d *= 2
    kprev = jnp.concatenate(
        [jnp.broadcast_to(kfill, (nc, 1, 1)), k3[:, :-1]], axis=1
    )
    v = jnp.where(k3 != kprev, v, 0)
    return v.reshape(m, c_pad)


def _mxu_kernel_cg_pre(tbl_ref, ids_ref, feats_ref, grid_ref, *,
                       tile_pillars, occ_col, dot_dtype, nonneg, pack=1):
    """Chunk-scheduled kernel over PRE-DEDUPED payload rows.

    Same schedule as `_mxu_kernel_cg`, but the chunk-local segmented max
    and head-zeroing already happened on the XLA side
    (`_chunk_dedup_xla`), so the body is just one-hot routing + matmul +
    cross-chunk combine — no per-chunk scan, no id lane extraction."""
    s = pl.program_id(0)
    t = tbl_ref[0, s]
    g = tbl_ref[1, s]
    first = tbl_ref[2, s]
    v = tbl_ref[3, s]

    @pl.when(first == 1)
    def _():
        grid_ref[:] = jnp.zeros_like(grid_ref)

    @pl.when(v == 1)
    def _():
        vals = feats_ref[:]  # (CHUNK, c_pad), auto-pipelined
        row = ids_ref[pl.ds(jax.lax.rem(g, 8), 1), :]  # (1, CHUNK) int32
        rows_per_tile = tile_pillars // pack
        if pack > 1:
            row = row // pack
        row_ids = (
            jax.lax.broadcasted_iota(
                jnp.int32, (rows_per_tile, _MXU_CHUNK), 0
            )
            + t * rows_per_tile
        )
        onehot = (row == row_ids).astype(dot_dtype)
        contrib = jax.lax.dot_general(
            onehot, vals.astype(dot_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if dot_dtype == jnp.float32 else
                       jax.lax.Precision.DEFAULT),
        )
        if nonneg:
            grid_ref[:] = jnp.maximum(
                grid_ref[:], contrib.astype(grid_ref.dtype)
            )
        else:
            c_pad = vals.shape[1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)
            occ_lane = (lane == occ_col).astype(jnp.float32)
            touched = (contrib * occ_lane).sum(axis=1, keepdims=True) > 0.0
            cur = grid_ref[:]
            contrib_c = contrib.astype(cur.dtype)
            seen = (cur.astype(jnp.float32) * occ_lane).sum(
                axis=1, keepdims=True
            ) > 0.0
            upd = jnp.where(seen, jnp.maximum(cur, contrib_c), contrib_c)
            grid_ref[:] = jnp.where(touched, upd, cur)


def _scatter_mxu_impl(point_feats, flat_ids, valid, height, width, tile_rows,
                      nonneg=False, pack=1):
    out_dtype = point_feats.dtype
    # int8 payload mode (quant deploy — the round-4 ledger's last named
    # scatter lever): the caller hands symmetric-quantized nonneg codes in
    # [0, 127] and gets the grid of per-pillar max CODES back as int8.
    # Per-tensor monotone quantization commutes with max, so this is exact
    # w.r.t. the int8 model's own conv1-input semantics, and it halves the
    # sorted-payload gather + dedup-scan + chunk-DMA bytes. The kernel
    # accumulates in bf16 (codes <= 127 are exact in bf16, so the one-hot
    # matmul and max-combine are exact); only the streamed payload is int8.
    is_int8 = out_dtype == jnp.int8
    B, N, C = point_feats.shape
    hw = height * width
    tile_pillars = tile_rows * width
    num_tiles = -(-height // tile_rows)
    padded_pillars = num_tiles * tile_pillars
    if pack > 1:
        # lane packing folds `pack` pillars per output row; the gated
        # (negative-feature) combine is per-row and therefore wrong across
        # lane groups, so packing is nonneg-only
        assert nonneg, "pack > 1 requires nonneg=True"
        assert tile_pillars % pack == 0 and hw % pack == 0
        c_pad = max(128, -(-(pack * (C + 1) + 2) // 128) * 128)
    else:
        c_pad = max(128, -(-(C + 3) // 128) * 128)
    # the id/key columns sit right after the (packed) payload block, so the
    # pack == 1 layout is exactly the original [feats | occ | id | key | 0...]
    id_col = pack * (C + 1)
    key_col = id_col + 1
    # bf16 inputs round-trip exactly through the fp32 working layout, so a
    # bf16 grid (and bf16 one-hot matmul) is exact; fp32 inputs keep fp32
    acc_dtype = (jnp.bfloat16
                 if (out_dtype == jnp.bfloat16 or is_int8)
                 else jnp.float32)

    use_xla_dedup = _MXU_SCHED == "chunk" and _MXU_DEDUP == "xla"
    if is_int8:
        if not (nonneg and pack == 1 and use_xla_dedup):
            raise ValueError(
                "int8 scatter payload requires nonneg=True, pack=1 and the "
                "shipped chunk-schedule/xla-dedup configuration (the legacy "
                "in-kernel-scan layout carries fp32 id lanes)"
            )

    def one(feats, ids, ok):
        key = jnp.where(ok, ids, hw).astype(jnp.int32)
        # payload dtype: with the dedup scan on the XLA side nothing in the
        # kernel needs id lanes or fp32 exactness, so bf16 inputs stream
        # bf16 (halved gather + chunk-DMA bytes) and int8 quant codes
        # stream int8 (halved again); the legacy in-kernel-scan path keeps
        # the fp32 [.. | id | key] layout it depends on
        if is_int8:
            pdt = jnp.int8
        elif use_xla_dedup and out_dtype == jnp.bfloat16:
            pdt = jnp.bfloat16
        else:
            pdt = jnp.float32
        # Building the full row FIRST and gathering ONCE matters: XLA's TPU
        # gather cost is per-index, so three separate gathers by `order`
        # (ids, ok, feats) cost ~3x one wide row gather.
        payload = jnp.concatenate(
            [
                feats.astype(pdt) * ok[:, None].astype(pdt),
                ok[:, None].astype(pdt),
            ],
            axis=-1,
        )  # (N, C+1): [feats | occ]
        if pack > 1:
            # place each pillar's payload at lane offset (C+1)*(id % pack);
            # invalid rows are all-zero, so their placement is irrelevant
            grp = (key % pack)[:, None]
            packed = jnp.concatenate(
                [jnp.where(grp == g, payload, 0) for g in range(pack)],
                axis=-1,
            )
        else:
            packed = payload
        # pad so chunk DMAs never run off the end, the id table reshapes
        # into whole chunks, and its row count is 8-aligned (group DMAs)
        pad_n = (
            -(-(N + _MXU_CHUNK) // (8 * _MXU_CHUNK)) * 8 * _MXU_CHUNK - N
        )
        if use_xla_dedup:
            # one zero row is appended to the gather SOURCE and the pad
            # rows ride the gather as out-of-range-pointing indices: the
            # padded sorted payload materializes in one pass (gather is
            # not fusible with a following concat, so padding after the
            # gather costs a full extra read+write of the array; the
            # source-side concats fuse into the payload-build fusion)
            row = packed
            if packed.shape[1] < c_pad:
                row = jnp.concatenate(
                    [row, jnp.zeros((N, c_pad - packed.shape[1]), pdt)],
                    axis=-1,
                )
            row = jnp.concatenate([row, jnp.zeros((1, c_pad), pdt)])
            sorted_key, order = jax.lax.sort_key_val(
                key, jnp.arange(N, dtype=jnp.int32)
            )
            order_p = jnp.concatenate(
                [order, jnp.full((pad_n,), N, jnp.int32)]
            )
            aug = jnp.take_along_axis(row, order_p[:, None], axis=0)
            sorted_ids = jnp.concatenate(
                [sorted_key, jnp.full((pad_n,), hw, jnp.int32)]
            )
            aug = _chunk_dedup_xla(aug, sorted_ids, _MXU_CHUNK)
        else:
            row = jnp.concatenate(
                [
                    packed.astype(jnp.float32),
                    jnp.where(ok, key, -2).astype(jnp.float32)[:, None],
                    key.astype(jnp.float32)[:, None],
                    jnp.zeros(
                        (N, c_pad - packed.shape[1] - 2), jnp.float32
                    ),
                ],
                axis=-1,
            )
            order = jnp.argsort(key)
            aug = jnp.take_along_axis(row, order[:, None], axis=0)
            # pad rows must not share a scan-id-column value with any real
            # pillar (the in-kernel dedup scan merges equal-id neighbors)
            pad_row = (
                jnp.zeros((pad_n, c_pad), jnp.float32)
                .at[:, id_col].set(-2.0)
                .at[:, key_col].set(float(hw))
            )
            aug = jnp.concatenate([aug, pad_row])
            sorted_ids = aug[:, key_col].astype(jnp.int32)
        ids_2d = sorted_ids.reshape(-1, _MXU_CHUNK)

        tile_bounds = (
            jnp.arange(num_tiles + 1, dtype=jnp.int32) * tile_pillars
        )
        tile_starts = jnp.searchsorted(
            sorted_ids[:N], tile_bounds, side="left"
        ).astype(jnp.int32)

        if _MXU_SCHED == "chunk":
            ch = _MXU_CHUNK
            starts, ends = tile_starts[:-1], tile_starts[1:]
            astarts = (starts // ch) * ch
            # chunks this tile really owns (0 for empty tiles); every tile
            # still gets >= 1 slot so its output block is zero-initialized
            real = jnp.where(
                ends > starts, -(-(ends - astarts) // ch), 0
            ).astype(jnp.int32)
            nct = jnp.maximum(real, 1)
            cum = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(nct, dtype=jnp.int32)]
            )
            # static slot budget: every chunk once + one spill/dummy per
            # tile; data never exceeds it (sum(real) <= chunks, +1/tile)
            S = aug.shape[0] // ch + num_tiles
            s_idx = jnp.arange(S, dtype=jnp.int32)
            t_of = jnp.clip(
                jnp.searchsorted(cum, s_idx, side="right").astype(jnp.int32)
                - 1,
                0, num_tiles - 1,
            )
            off = s_idx - cum[t_of]
            first = (off == 0).astype(jnp.int32)
            g_of = jnp.clip(
                astarts[t_of] // ch + off, 0, ids_2d.shape[0] - 1
            )
            valid_s = (off < real[t_of]).astype(jnp.int32)
            tbl = jnp.stack([t_of, g_of, first, valid_s])

            if use_xla_dedup:
                kern = partial(
                    _mxu_kernel_cg_pre, tile_pillars=tile_pillars,
                    occ_col=C, dot_dtype=acc_dtype, nonneg=nonneg,
                    pack=pack,
                )
            else:
                kern = partial(
                    _mxu_kernel_cg, tile_pillars=tile_pillars,
                    occ_col=C, id_col=id_col, dot_dtype=acc_dtype,
                    nonneg=nonneg, pack=pack,
                )
            grid = pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(S,),
                    in_specs=[
                        pl.BlockSpec(
                            (8, _MXU_CHUNK),
                            lambda s, tbl: (tbl[1, s] // 8, 0),
                        ),
                        pl.BlockSpec(
                            (_MXU_CHUNK, c_pad),
                            lambda s, tbl: (tbl[1, s], 0),
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (tile_pillars // pack, c_pad),
                        lambda s, tbl: (tbl[0, s], 0),
                    ),
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (padded_pillars // pack, c_pad), acc_dtype
                ),
            )(tbl, ids_2d, aug)
        else:
            assert pack == 1, "lane packing needs the 'chunk' schedule"
            grid = pl.pallas_call(
                partial(_mxu_kernel, tile_pillars=tile_pillars, occ_col=C,
                        id_col=C + 1, dot_dtype=acc_dtype, nonneg=nonneg),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(num_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pl.ANY),  # ids
                        pl.BlockSpec(memory_space=pl.ANY),  # feats + occ
                    ],
                    out_specs=pl.BlockSpec(
                        (tile_pillars, c_pad), lambda t, *_: (t, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((2, _MXU_CHUNK, c_pad), aug.dtype),
                        pltpu.VMEM((2, 8, _MXU_CHUNK), jnp.int32),
                        pltpu.SemaphoreType.DMA((4,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (padded_pillars, c_pad), acc_dtype
                ),
            )(tile_starts, ids_2d, aug)

        if pack > 1:
            # unfold the lane groups: row r lanes [(C+1)g, (C+1)(g+1)) hold
            # pillar r*pack + g
            stride = C + 1
            per = jnp.stack(
                [
                    grid[: hw // pack, g * stride:(g + 1) * stride]
                    for g in range(pack)
                ],
                axis=1,
            ).reshape(hw, stride)
            occ = per[:, C] > 0.0
            out = jnp.where(occ[:, None], per[:, :C], 0.0).astype(out_dtype)
        else:
            occ = grid[:hw, C] > 0.0
            out = jnp.where(
                occ[:, None], grid[:hw, :C], 0.0
            ).astype(out_dtype)
        return out.reshape(height, width, C), occ.reshape(height, width)

    return jax.vmap(one)(point_feats, flat_ids, valid)


def _pack_residual_rows(grid, height, width):
    """Reshape the saved (B, H, W, C) grid to (B, hw/p, p*C) with p*C = 128.

    The VJP keeps the forward grid as a residual across the fwd/bwd split.
    Stored flat as (B, hw, C) with C = 32 minor, the TPU (8, 128)-lane
    tiling pads the lane dim 32 -> 128 and the residual costs 4x its data
    (measured: 1.98 GB for bf16[4, 1440^2, 32] in a bs=4 train graph).
    Folding p = 128/C consecutive pillar rows into one 128-lane row stores
    the same bytes unpadded; the backward gathers row id//p and selects
    lane group id%p."""
    B, C = grid.shape[0], grid.shape[-1]
    hw = height * width
    p = max(1, 128 // C)
    while p > 1 and hw % p:
        p //= 2
    return grid.reshape(B, hw // p, p * C)


def _scatter_mxu_vjp_fwd(point_feats, flat_ids, valid, height, width,
                         tile_rows, nonneg, pack):
    grid, occ = _scatter_mxu_impl(
        point_feats, flat_ids, valid, height, width, tile_rows, nonneg, pack
    )
    res = (point_feats, flat_ids, valid,
           _pack_residual_rows(grid, height, width))
    return (grid, occ), res


def _scatter_mxu_vjp_bwd(height, width, tile_rows, nonneg, pack, residuals,
                         cotangents):
    return _scatter_vjp_bwd(height, width, tile_rows, residuals, cotangents)


pillar_scatter_max_mxu.defvjp(_scatter_mxu_vjp_fwd, _scatter_mxu_vjp_bwd)


def _scatter_vjp_fwd(point_feats, flat_ids, valid, height, width, tile_rows):
    grid, occ = _scatter_fwd_impl(
        point_feats, flat_ids, valid, height, width, tile_rows
    )
    res = (point_feats, flat_ids, valid,
           _pack_residual_rows(grid, height, width))
    return (grid, occ), res


def _scatter_vjp_bwd(height, width, tile_rows, residuals, cotangents):
    point_feats, flat_ids, valid, grid_rows = residuals
    dgrid = cotangents[0]  # occupancy is boolean -> no gradient

    B, N, C = point_feats.shape
    hw = height * width
    p = grid_rows.shape[2] // C  # row-packing factor (_pack_residual_rows)
    # ONE fused gather on a concatenated [grid | dgrid] table: XLA's TPU
    # gather cost is per-index, so doubling the row width quarters the
    # total vs two separate 32-wide gathers (measured 27.3 -> 7.2 ms for
    # 262k points from a 1440^2 grid). Rows are p-packed to 128 lanes; the
    # per-point lane group is picked out after the gather.
    dt = jnp.promote_types(grid_rows.dtype, dgrid.dtype)
    fg = jnp.concatenate(
        [grid_rows.astype(dt),
         dgrid.reshape(B, hw // p, p * C).astype(dt)],
        axis=-1,
    )
    pid = jnp.clip(flat_ids, 0, hw - 1).astype(jnp.int32)
    both = jnp.take_along_axis(fg, (pid // p)[..., None], axis=1)
    if p > 1:
        sub = (pid % p)[..., None, None]  # lane group within the packed row
        g_at = jnp.take_along_axis(
            both[..., : p * C].reshape(B, N, p, C), sub, axis=2
        )[:, :, 0]
        d_at = jnp.take_along_axis(
            both[..., p * C :].reshape(B, N, p, C), sub, axis=2
        )[:, :, 0]
    else:
        g_at, d_at = both[..., :C], both[..., C:]

    # winner test in the grid dtype (bf16 -> wider is exact)
    winner = (
        (point_feats.astype(grid_rows.dtype).astype(dt) == g_at)
        & valid[..., None]
    )
    dpf = jnp.where(winner, d_at, 0).astype(point_feats.dtype)
    return (dpf, None, None)


pillar_scatter_max_pallas.defvjp(_scatter_vjp_fwd, _scatter_vjp_bwd)
