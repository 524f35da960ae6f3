"""Round-4 on-chip probes: decompose the MXU scatter's per-slot cost.

The chunk-scheduled MXU scatter (`ops/pallas/voxelize_kernel.py`,
`_mxu_kernel_cg`) measures ~12.5 ms for the flagship 262k -> 1440^2 x 32
workload against a ~6 ms roofline derived for the one-hot formulation.
Round-3 evidence (lane-packing shrank one-hot + grid traffic 3x for only
~0.4 ms kernel-side gain) says the kernel is NOT bound by one-hot VPU work
or output traffic — something per-slot and fixed dominates. This probe
separates the candidates, each timed against the per-run dispatch floor:

  prep_only   XLA-side preprocess (argsort + wide payload gather + table)
  baseline    the shipped kernel, tr=2 nonneg (expect ~12.5 incl. prep)
  null        same slot schedule, kernel body = init only
              -> schedule + block-DMA machinery cost, no compute
  noscan      full kernel minus the chunk-local dedup scan
  nomm        full kernel minus the one-hot + matmul
  ident_in    inputs pre-gathered per slot on the XLA side so the input
              BlockSpecs use identity (slot -> slot) index maps instead of
              scalar-prefetched table lookups -> tests whether
              data-dependent input maps defeat Mosaic's pipelining
  oneblock    ident_in + all output to one revisited block -> removes
              per-tile output flushes on top

Run to completion; do not kill mid-run (a stale claim wedges the chip).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from __graft_entry__ import _synth_points_realistic
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk
    from pillarnet_lts_tpu.ops.voxelize import PillarSpec, voxelize_points

    CH = vk._MXU_CHUNK

    # --- dispatch floor (same protocol as bench.py) -----------------------
    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros(())
    float(np.asarray(tiny(z)))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(np.asarray(tiny(z)))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"[floor] {floor * 1000:.2f} ms", flush=True)

    def timeit(name, fn, *fargs, iters=10):
        t0 = time.perf_counter()
        s = float(np.asarray(fn(*fargs)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
              f"(checksum {s:.3e})", flush=True)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(fn(*fargs)))
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        print(f"[steady]  {name}: {t * 1000:.2f} ms raw, "
              f"{(t - floor) * 1000:.2f} ms on-chip", flush=True)
        return t - floor

    # --- workload ---------------------------------------------------------
    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    N, C, H, W = 262144, 32, 1440, 1440
    tile_rows = 2
    hw = H * W
    tile_pillars = tile_rows * W
    num_tiles = -(-H // tile_rows)
    c_pad = 128
    occ_col, id_col, key_col = C, C + 1, C + 2

    pts, mask = _synth_points_realistic(1, N, pc_range)
    spec = PillarSpec(0.075, pc_range)

    @jax.jit
    def make_inputs(p, m, key):
        feats, ids, ok = voxelize_points(p, m, spec)
        f = jax.nn.relu(jax.random.normal(key, (1, N, C), jnp.bfloat16))
        return f, ids, ok

    featsd, idsd, okd = make_inputs(
        jnp.asarray(pts), jnp.asarray(mask), jax.random.PRNGKey(0)
    )
    featsd = jax.block_until_ready(featsd)

    # --- XLA-side preprocess, mirrors _scatter_mxu_impl 'chunk' branch ----
    def preprocess(feats, ids, ok):
        feats, ids, ok = feats[0], ids[0], ok[0]
        key = jnp.where(ok, ids, hw).astype(jnp.int32)
        payload = jnp.concatenate(
            [feats.astype(jnp.float32) * ok[:, None],
             ok[:, None].astype(jnp.float32)], axis=-1)
        row = jnp.concatenate(
            [payload,
             jnp.where(ok, key, -2).astype(jnp.float32)[:, None],
             key.astype(jnp.float32)[:, None],
             jnp.zeros((N, c_pad - payload.shape[1] - 2), jnp.float32)],
            axis=-1)
        order = jnp.argsort(key)
        aug = jnp.take_along_axis(row, order[:, None], axis=0)
        pad_n = -(-(N + CH) // (8 * CH)) * 8 * CH - N
        pad_row = (jnp.zeros((pad_n, c_pad), jnp.float32)
                   .at[:, id_col].set(-2.0)
                   .at[:, key_col].set(float(hw)))
        aug = jnp.concatenate([aug, pad_row])
        sorted_ids = aug[:, key_col].astype(jnp.int32)
        ids_2d = sorted_ids.reshape(-1, CH)

        tile_bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * tile_pillars
        tile_starts = jnp.searchsorted(
            sorted_ids[:N], tile_bounds, side="left").astype(jnp.int32)

        starts, ends = tile_starts[:-1], tile_starts[1:]
        astarts = (starts // CH) * CH
        real = jnp.where(ends > starts, -(-(ends - astarts) // CH), 0
                         ).astype(jnp.int32)
        nct = jnp.maximum(real, 1)
        cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(nct, dtype=jnp.int32)])
        S = aug.shape[0] // CH + num_tiles
        s_idx = jnp.arange(S, dtype=jnp.int32)
        t_of = jnp.clip(
            jnp.searchsorted(cum, s_idx, side="right").astype(jnp.int32) - 1,
            0, num_tiles - 1)
        off = s_idx - cum[t_of]
        first = (off == 0).astype(jnp.int32)
        g_of = jnp.clip(astarts[t_of] // CH + off, 0, ids_2d.shape[0] - 1)
        valid_s = (off < real[t_of]).astype(jnp.int32)
        tbl = jnp.stack([t_of, g_of, first, valid_s])
        return tbl, ids_2d, aug, real

    # slot statistics (host)
    tbl_h, ids2d_h, aug_h, real_h = jax.jit(preprocess)(featsd, idsd, okd)
    tbl_h = np.asarray(tbl_h)
    real_h = np.asarray(real_h)
    S = tbl_h.shape[1]
    print(f"[stats] slots S={S} valid={int(tbl_h[3].sum())} "
          f"first={int(tbl_h[2].sum())} occupied_tiles={int((real_h > 0).sum())}"
          f"/{num_tiles} chunks={aug_h.shape[0] // CH} "
          f"real_chunk_slots={int(real_h.sum())}", flush=True)

    @jax.jit
    def prep_only(f, i, o):
        tbl, ids_2d, aug, _ = preprocess(f, i, o)
        return (tbl.sum() + ids_2d[::97, ::31].sum()
                + aug[::257, ::17].astype(jnp.float32).sum())

    timeit("prep_only", prep_only, featsd, idsd, okd)

    # --- baseline: shipped kernel ----------------------------------------
    @jax.jit
    def baseline(f, i, o):
        g, occ = vk.pillar_scatter_max_mxu(f, i, o, H, W, tile_rows, True, 1)
        return g.astype(jnp.float32).sum() + occ.sum()

    timeit("baseline tr2 nonneg", baseline, featsd, idsd, okd)

    # --- variant kernels --------------------------------------------------
    def kern_null(tbl_ref, ids_ref, feats_ref, grid_ref):
        s = pl.program_id(0)
        first = tbl_ref[2, s]

        @pl.when(first == 1)
        def _():
            grid_ref[:] = jnp.zeros_like(grid_ref)

    def kern_var(tbl_ref, ids_ref, feats_ref, grid_ref, *, scan, matmul):
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
            vals = feats_ref[:]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)
            id_lane = (lane == id_col).astype(jnp.float32)
            idc = (vals * id_lane).sum(axis=1, keepdims=True)
            if scan:
                d = 1
                while d < CH:
                    same = idc == jnp.concatenate(
                        [idc[d:], jnp.full((d, 1), -1.0, idc.dtype)], axis=0)
                    shifted = jnp.concatenate(
                        [vals[d:], jnp.zeros((d, c_pad), vals.dtype)], axis=0)
                    vals = jnp.where(same, jnp.maximum(vals, shifted), vals)
                    d *= 2
                prev = jnp.concatenate(
                    [jnp.full((1, 1), -1.0, idc.dtype), idc[:-1]], axis=0)
                vals = jnp.where(idc != prev, vals, 0.0)
            if matmul:
                row = ids_ref[pl.ds(jax.lax.rem(g, 8), 1), :]
                row_ids = (jax.lax.broadcasted_iota(
                    jnp.int32, (tile_pillars, CH), 0) + t * tile_pillars)
                onehot = (row == row_ids).astype(jnp.bfloat16)
                contrib = jax.lax.dot_general(
                    onehot, vals.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                grid_ref[:] = jnp.maximum(
                    grid_ref[:], contrib.astype(grid_ref.dtype))
            else:
                # keep vals live with a cheap row write
                grid_ref[pl.ds(0, 8), :] = jnp.maximum(
                    grid_ref[pl.ds(0, 8), :],
                    vals[0:8, :].astype(grid_ref.dtype))

    def run_sched(kern, f, i, o):
        tbl, ids_2d, aug, _ = preprocess(f, i, o)
        grid = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((8, CH), lambda s, tbl: (tbl[1, s] // 8, 0)),
                    pl.BlockSpec((CH, c_pad), lambda s, tbl: (tbl[1, s], 0)),
                ],
                out_specs=pl.BlockSpec(
                    (tile_pillars, c_pad), lambda s, tbl: (tbl[0, s], 0)),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (num_tiles * tile_pillars, c_pad), jnp.bfloat16),
        )(tbl, ids_2d, aug)
        return grid[: hw, : C + 1].astype(jnp.float32).sum()

    timeit("null (init only)", jax.jit(partial(run_sched, kern_null)),
           featsd, idsd, okd)
    timeit("noscan", jax.jit(partial(
        run_sched, partial(kern_var, scan=False, matmul=True))),
        featsd, idsd, okd)
    timeit("nomm (scan only)", jax.jit(partial(
        run_sched, partial(kern_var, scan=True, matmul=False))),
        featsd, idsd, okd)

    # --- identity-input variants -----------------------------------------
    def kern_ident(tbl_ref, ids_ref, feats_ref, grid_ref, *, one_block):
        s = pl.program_id(0)
        t = tbl_ref[0, s]
        first = tbl_ref[2, s]
        v = tbl_ref[3, s]

        @pl.when(first == 1)
        def _():
            grid_ref[:] = jnp.zeros_like(grid_ref)

        @pl.when(v == 1)
        def _():
            vals = feats_ref[0]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)
            id_lane = (lane == id_col).astype(jnp.float32)
            idc = (vals * id_lane).sum(axis=1, keepdims=True)
            d = 1
            while d < CH:
                same = idc == jnp.concatenate(
                    [idc[d:], jnp.full((d, 1), -1.0, idc.dtype)], axis=0)
                shifted = jnp.concatenate(
                    [vals[d:], jnp.zeros((d, c_pad), vals.dtype)], axis=0)
                vals = jnp.where(same, jnp.maximum(vals, shifted), vals)
                d *= 2
            prev = jnp.concatenate(
                [jnp.full((1, 1), -1.0, idc.dtype), idc[:-1]], axis=0)
            vals = jnp.where(idc != prev, vals, 0.0)
            row = ids_ref[0, pl.ds(0, 1), :]
            base = jnp.where(one_block == 0, t * tile_pillars, 0)
            row_ids = (jax.lax.broadcasted_iota(
                jnp.int32, (tile_pillars, CH), 0) + base)
            onehot = (row == row_ids).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                onehot, vals.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            grid_ref[:] = jnp.maximum(
                grid_ref[:], contrib.astype(grid_ref.dtype))

    def run_ident(one_block, f, i, o):
        tbl, ids_2d, aug, _ = preprocess(f, i, o)
        nc = aug.shape[0] // CH
        aug3 = aug.reshape(nc, CH, c_pad)
        g_of = tbl[1]
        feats_slots = aug3[g_of]                      # (S, CH, c_pad)
        ids_slots = ids_2d[g_of][:, None, :]          # (S, 1, CH)
        if one_block:
            out_spec = pl.BlockSpec(
                (tile_pillars, c_pad), lambda s, tbl: (0, 0))
            out_rows = tile_pillars
        else:
            out_spec = pl.BlockSpec(
                (tile_pillars, c_pad), lambda s, tbl: (tbl[0, s], 0))
            out_rows = num_tiles * tile_pillars
        grid = pl.pallas_call(
            partial(kern_ident, one_block=1 if one_block else 0),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((1, 1, CH), lambda s, tbl: (s, 0, 0)),
                    pl.BlockSpec((1, CH, c_pad), lambda s, tbl: (s, 0, 0)),
                ],
                out_specs=out_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((out_rows, c_pad), jnp.bfloat16),
        )(tbl, ids_slots, feats_slots)
        return grid[:, : C + 1].astype(jnp.float32).sum()

    timeit("ident_in", jax.jit(partial(run_ident, False)),
           featsd, idsd, okd)
    timeit("oneblock", jax.jit(partial(run_ident, True)),
           featsd, idsd, okd)


def phase2():
    """A/B the round-4 XLA-side-dedup path against the round-3 in-kernel
    scan, and sub-decompose the XLA preprocess (sort / gather / dedup)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _synth_points_realistic
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk
    from pillarnet_lts_tpu.ops.voxelize import PillarSpec, voxelize_points

    CH = vk._MXU_CHUNK

    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros(())
    float(np.asarray(tiny(z)))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(np.asarray(tiny(z)))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"[floor] {floor * 1000:.2f} ms", flush=True)

    def timeit(name, fn, *fargs, iters=10):
        t0 = time.perf_counter()
        s = float(np.asarray(fn(*fargs)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
              f"(checksum {s:.3e})", flush=True)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(fn(*fargs)))
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        print(f"[steady]  {name}: {t * 1000:.2f} ms raw, "
              f"{(t - floor) * 1000:.2f} ms on-chip", flush=True)
        return t - floor

    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    N, C, H, W = 262144, 32, 1440, 1440
    hw = H * W
    pts, mask = _synth_points_realistic(1, N, pc_range)
    spec = PillarSpec(0.075, pc_range)

    @jax.jit
    def make_inputs(p, m, key):
        feats, ids, ok = voxelize_points(p, m, spec)
        f = jax.nn.relu(jax.random.normal(key, (1, N, C), jnp.bfloat16))
        return f, ids, ok

    featsd, idsd, okd = make_inputs(
        jnp.asarray(pts), jnp.asarray(mask), jax.random.PRNGKey(0)
    )
    featsd = jax.block_until_ready(featsd)

    # prep sub-decomposition (bf16 slim payload, the new path's shapes)
    @jax.jit
    def sort_only(f, i, o):
        key = jnp.where(o[0], i[0], hw).astype(jnp.int32)
        sk, order = jax.lax.sort_key_val(
            key, jnp.arange(N, dtype=jnp.int32))
        return sk[::127].sum() + order[::255].sum()

    timeit("sort_only", sort_only, featsd, idsd, okd)

    def build_sorted(f, i, o):
        key = jnp.where(o[0], i[0], hw).astype(jnp.int32)
        payload = jnp.concatenate(
            [f[0] * o[0][:, None].astype(jnp.bfloat16),
             o[0][:, None].astype(jnp.bfloat16),
             jnp.zeros((N, 128 - C - 1), jnp.bfloat16)], axis=-1)
        sk, order = jax.lax.sort_key_val(
            key, jnp.arange(N, dtype=jnp.int32))
        aug = jnp.take_along_axis(payload, order[:, None], axis=0)
        pad_n = -(-(N + CH) // (8 * CH)) * 8 * CH - N
        aug = jnp.concatenate([aug, jnp.zeros((pad_n, 128), jnp.bfloat16)])
        sk = jnp.concatenate([sk, jnp.full((pad_n,), hw, jnp.int32)])
        return aug, sk

    @jax.jit
    def sort_gather(f, i, o):
        aug, sk = build_sorted(f, i, o)
        return aug[::257, ::17].astype(jnp.float32).sum() + sk[::127].sum()

    timeit("sort+gather (bf16)", sort_gather, featsd, idsd, okd)

    @jax.jit
    def sort_gather_dedup(f, i, o):
        aug, sk = build_sorted(f, i, o)
        aug = vk._chunk_dedup_xla(aug, sk, CH)
        return aug[::257, ::17].astype(jnp.float32).sum() + sk[::127].sum()

    timeit("sort+gather+dedup (bf16)", sort_gather_dedup, featsd, idsd, okd)

    # full scatter, both dedup modes
    for mode in ("xla", "kernel"):
        vk.set_mxu_dedup(mode)

        @jax.jit
        def scat(f, i, o):
            g, occ = vk.pillar_scatter_max_mxu(f, i, o, H, W, 2, True, 1)
            return g.astype(jnp.float32).sum() + occ.sum()

        timeit(f"mxu scatter dedup={mode}", scat, featsd, idsd, okd)
    vk.set_mxu_dedup("xla")

    # tile_rows re-sweep under the slim path (per-slot compute is now tiny,
    # so the optimum may have moved)
    for tr in (1, 2, 4):
        @jax.jit
        def scat_tr(f, i, o, tr=tr):
            g, occ = vk.pillar_scatter_max_mxu(f, i, o, H, W, tr, True, 1)
            return g.astype(jnp.float32).sum() + occ.sum()

        timeit(f"mxu scatter xla-dedup tr={tr}", scat_tr, featsd, idsd, okd)


def phase3():
    """Interleaved-timing sweep of tile_rows x chunk under the slim
    (XLA-dedup) kernel: the relay latency drifts several ms between
    compiles, so each variant is timed in alternating rounds against the
    same-session floor, and the floor is re-measured per round."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _synth_points_realistic
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk
    from pillarnet_lts_tpu.ops.voxelize import PillarSpec, voxelize_points

    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    N, C, H, W = 262144, 32, 1440, 1440
    pts, mask = _synth_points_realistic(1, N, pc_range)
    spec = PillarSpec(0.075, pc_range)

    @jax.jit
    def make_inputs(p, m, key):
        feats, ids, ok = voxelize_points(p, m, spec)
        f = jax.nn.relu(jax.random.normal(key, (1, N, C), jnp.bfloat16))
        return f, ids, ok

    featsd, idsd, okd = make_inputs(
        jnp.asarray(pts), jnp.asarray(mask), jax.random.PRNGKey(0)
    )
    featsd = jax.block_until_ready(featsd)

    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros(())
    float(np.asarray(tiny(z)))

    def measure_floor():
        fs = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(np.asarray(tiny(z)))
            fs.append(time.perf_counter() - t0)
        return float(np.median(fs))

    variants = []
    for tr, ch in ((1, 512), (2, 512), (4, 512), (1, 256), (2, 256)):
        def make(tr=tr, ch=ch):
            @jax.jit
            def scat(f, i, o):
                prev = vk._MXU_CHUNK
                vk._MXU_CHUNK = ch
                try:
                    g, occ = vk.pillar_scatter_max_mxu(
                        f, i, o, H, W, tr, True, 1)
                finally:
                    vk._MXU_CHUNK = prev
                return g.astype(jnp.float32).sum() + occ.sum()
            return scat

        variants.append((f"tr={tr} ch={ch}", make()))

    # compile all first
    for name, fn in variants:
        t0 = time.perf_counter()
        s = float(np.asarray(fn(featsd, idsd, okd)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
              f"(checksum {s:.3e})", flush=True)

    results = {name: [] for name, _ in variants}
    for rnd in range(4):
        floor = measure_floor()
        for name, fn in variants:
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                float(np.asarray(fn(featsd, idsd, okd)))
                ts.append(time.perf_counter() - t0)
            results[name].append(float(np.median(ts)) - floor)
        print(f"[round {rnd}] floor {floor * 1000:.2f} ms | "
              + " | ".join(f"{n}: {results[n][-1] * 1000:.2f}"
                           for n, _ in variants), flush=True)
    for name, _ in variants:
        vals = sorted(results[name])
        print(f"[final] {name}: median {np.median(vals) * 1000:.2f} ms "
              f"min {vals[0] * 1000:.2f} ms", flush=True)


def phase5():
    """In-model reader-graph A/B of the scatter dedup placement.

    The isolated scatter probe says xla-dedup wins (9.7 vs 13.9 ms same
    session), but the round-4 full-model profile shows the READER phase
    (voxelize + PFE + scatter in one jit) regressing ~17 -> ~38 ms
    on-chip. Hypothesis: inside the larger graph XLA fuses the payload
    gather into each of the 9 dedup shift passes (producer duplication),
    re-gathering 9x. This times the READER-shaped graph (voxelize + MLP +
    scatter, one jit) under both dedup modes, plus an xla-dedup variant
    with the gather forced un-fusable via optimization_barrier."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _synth_points_realistic
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk
    from pillarnet_lts_tpu.ops.voxelize import PillarSpec, voxelize_points

    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros(())
    float(np.asarray(tiny(z)))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(np.asarray(tiny(z)))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"[floor] {floor * 1000:.2f} ms", flush=True)

    def timeit(name, fn, *fargs, iters=8):
        t0 = time.perf_counter()
        s = float(np.asarray(fn(*fargs)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
              f"(checksum {s:.3e})", flush=True)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(fn(*fargs)))
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        print(f"[steady]  {name}: {t * 1000:.2f} ms raw, "
              f"{(t - floor) * 1000:.2f} ms on-chip", flush=True)
        return t - floor

    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    N, C, H, W = 262144, 32, 1440, 1440
    pts, mask = _synth_points_realistic(1, N, pc_range)
    ptsd, maskd = jnp.asarray(pts), jnp.asarray(mask)
    spec = PillarSpec(0.075, pc_range)
    key = jax.random.PRNGKey(0)
    wmlp = jax.jit(lambda k: jax.random.normal(
        k, (7, C), jnp.float32) * 0.3)(key)

    def reader(p, m, w, barrier):
        feats, ids, ok = voxelize_points(p, m, spec)
        x = jax.nn.relu(
            feats.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16))
        if barrier:
            x = jax.lax.optimization_barrier(x)
        g, occ = vk.pillar_scatter_max_mxu(x, ids, ok, H, W, 2, True, 1)
        return g.astype(jnp.float32).sum() + occ.sum()

    for mode in ("kernel", "xla"):
        vk.set_mxu_dedup(mode)
        timeit(f"reader dedup={mode}",
               jax.jit(partial(reader, barrier=False)), ptsd, maskd, wmlp)
    vk.set_mxu_dedup("xla")
    timeit("reader dedup=xla +barrier",
           jax.jit(partial(reader, barrier=True)), ptsd, maskd, wmlp)
    # isolated scatter again in the SAME session for a clean delta
    @jax.jit
    def prep_in(p, m, k):
        feats, ids, ok = voxelize_points(p, m, spec)
        f = jax.nn.relu(jax.random.normal(k, (1, N, C), jnp.bfloat16))
        return f, ids, ok

    f0, i0, o0 = prep_in(ptsd, maskd, key)
    f0 = jax.block_until_ready(f0)
    for mode in ("kernel", "xla"):
        vk.set_mxu_dedup(mode)

        @jax.jit
        def scat(f, i, o):
            g, occ = vk.pillar_scatter_max_mxu(f, i, o, H, W, 2, True, 1)
            return g.astype(jnp.float32).sum() + occ.sum()

        timeit(f"isolated dedup={mode}", scat, f0, i0, o0)
    vk.set_mxu_dedup("xla")


def phase4():
    """Train-forward BN fusion-tax probe (judge item r4-#6).

    The training forward runs ~94 ms on-chip vs ~59 eval; ROADMAP blames
    the masked fp32 BN statistics passes (astype(f32) materialization +
    a second consumer per conv output). This times a conv2-stage-shaped
    chain (9x conv 64ch over the bs=1 W-tiled (8, 720, 104, 64) form) in
    four formulations:

      eval_folded   BN folded into conv weights (the eval lower bound)
      train_cur     current MaskedBatchNorm train semantics: astype(f32),
                    masked sum/sumsq, f32 normalize, cast back
      train_accum   no astype: masked sums via jnp.sum(..., dtype=f32)
                    straight off the bf16 conv output, normalize applied
                    as a bf16 affine (inv/shift computed f32)
      train_half    astype-free stats like train_accum but f32 normalize
                    (accuracy-identical to train_cur; isolates the
                    normalize-pass dtype from the stats-pass dtype)
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros(())
    float(np.asarray(tiny(z)))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(np.asarray(tiny(z)))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"[floor] {floor * 1000:.2f} ms", flush=True)

    def timeit(name, fn, *fargs, iters=8):
        t0 = time.perf_counter()
        s = float(np.asarray(fn(*fargs)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
              f"(checksum {s:.3e})", flush=True)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(fn(*fargs)))
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        print(f"[steady]  {name}: {t * 1000:.2f} ms raw, "
              f"{(t - floor) * 1000:.2f} ms on-chip", flush=True)
        return t - floor

    B, H, W, C, NCONV = 8, 720, 104, 64, 9
    key = jax.random.PRNGKey(0)
    x0 = jax.jit(lambda k: jax.nn.relu(
        jax.random.normal(k, (B, H, W, C), jnp.bfloat16)))(key)
    wts = jax.jit(lambda k: jax.random.normal(
        k, (NCONV, 3, 3, C, C), jnp.float32) * 0.05)(key)
    mask = jax.jit(lambda k: jax.random.uniform(k, (B, H, W)) > 0.3)(key)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def eval_folded(x, ws, m):
        mb = m.astype(jnp.bfloat16)[..., None]
        for i in range(NCONV):
            x = jax.nn.relu(conv(x, ws[i]) * mb)
        return x.astype(jnp.float32).sum()

    def bn_stats_cur(y, m):
        yf = y.astype(jnp.float32)
        mf = m.astype(jnp.float32)[..., None]
        cnt = jnp.maximum(mf.sum(), 1.0)
        s = (yf * mf).sum(axis=(0, 1, 2))
        ss = (yf * yf * mf).sum(axis=(0, 1, 2))
        mean = s / cnt
        var = jnp.maximum(ss / cnt - mean * mean, 0.0)
        return yf, mean, var

    @jax.jit
    def train_cur(x, ws, m):
        mf32 = m.astype(jnp.float32)[..., None]
        for i in range(NCONV):
            y = conv(x, ws[i])
            yf, mean, var = bn_stats_cur(y, m)
            inv = lax.rsqrt(var + 1e-3) * scale
            out = (yf - mean) * inv + bias
            out = out * mf32
            x = jax.nn.relu(out).astype(jnp.bfloat16)
        return x.astype(jnp.float32).sum() + mean.sum()

    @jax.jit
    def train_accum(x, ws, m):
        mb = m.astype(jnp.bfloat16)[..., None]
        cnt = jnp.maximum(m.astype(jnp.float32).sum(), 1.0)
        for i in range(NCONV):
            y = conv(x, ws[i])
            ym = y * mb
            s = jnp.sum(ym, axis=(0, 1, 2), dtype=jnp.float32)
            ss = jnp.sum(ym * ym, axis=(0, 1, 2), dtype=jnp.float32)
            mean = s / cnt
            var = jnp.maximum(ss / cnt - mean * mean, 0.0)
            inv = (lax.rsqrt(var + 1e-3) * scale)
            shift = (bias - mean * inv)
            out = y * inv.astype(y.dtype) + shift.astype(y.dtype)
            x = jax.nn.relu(out * mb)
        return x.astype(jnp.float32).sum() + mean.sum()

    @jax.jit
    def train_half(x, ws, m):
        mb = m.astype(jnp.bfloat16)[..., None]
        mf32 = m.astype(jnp.float32)[..., None]
        cnt = jnp.maximum(m.astype(jnp.float32).sum(), 1.0)
        for i in range(NCONV):
            y = conv(x, ws[i])
            ym = y * mb
            s = jnp.sum(ym, axis=(0, 1, 2), dtype=jnp.float32)
            ss = jnp.sum(ym * ym, axis=(0, 1, 2), dtype=jnp.float32)
            mean = s / cnt
            var = jnp.maximum(ss / cnt - mean * mean, 0.0)
            inv = lax.rsqrt(var + 1e-3) * scale
            out = (y.astype(jnp.float32) - mean) * inv + bias
            out = out * mf32
            x = jax.nn.relu(out).astype(jnp.bfloat16)
        return x.astype(jnp.float32).sum() + mean.sum()

    variants = [
        ("eval_folded", eval_folded),
        ("train_cur", train_cur),
        ("train_half", train_half),
        ("train_accum", train_accum),
    ]
    for name, fn in variants:
        t0 = time.perf_counter()
        s = float(np.asarray(fn(x0, wts, mask)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
              f"(checksum {s:.3e})", flush=True)
    # interleaved rounds: the relay latency drifts several ms within a
    # session, so only same-round comparisons are trustworthy
    results = {n: [] for n, _ in variants}
    for rnd in range(4):
        fs = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(np.asarray(tiny(z)))
            fs.append(time.perf_counter() - t0)
        fl = float(np.median(fs))
        line = [f"[round {rnd}] floor {fl * 1000:.2f}"]
        for name, fn in variants:
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                float(np.asarray(fn(x0, wts, mask)))
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts)) - fl
            results[name].append(t)
            line.append(f"{name}: {t * 1000:.2f}")
        print(" | ".join(line), flush=True)
    for name, _ in variants:
        v = sorted(results[name])
        print(f"[final] {name}: median {np.median(v) * 1000:.2f} ms "
              f"min {v[0] * 1000:.2f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "phase2":
        phase2()
    elif len(sys.argv) > 1 and sys.argv[1] == "phase3":
        phase3()
    elif len(sys.argv) > 1 and sys.argv[1] == "phase4":
        phase4()
    elif len(sys.argv) > 1 and sys.argv[1] == "phase5":
        phase5()
    else:
        main()
