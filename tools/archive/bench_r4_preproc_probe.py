"""Round-4 follow-up: split the MXU-scatter XLA preprocess cost cleanly.

The round-4 ledger (docs/ROADMAP.md "Scatter roofline, revised") puts the
XLA-side preprocess at ~6 ms but flags the split beyond the sort as
unmeasured: the earlier sub-probes consumed `aug` through strided slices
(`aug[::257, ::17].sum()`), which XLA pushes INTO the gather — the probe
then gathers only the sampled rows and under-reports the per-index cost.

This probe consumes every intermediate through
`jax.lax.optimization_barrier` followed by a full reduction, so each
stage's tensors are fully materialized and the gather pays all its
indices. Stages (each mirrors the shipped `use_xla_dedup` branch of
`_scatter_mxu_impl`, bf16 payload, c_pad=128):

  sort_only    sort_key_val(key, iota)
  sort_gather  + payload build + one wide (N+pad, 128) bf16 row gather
  sort_table   sort + searchsorted tile bounds + slot table (no gather)
  full_prep    sort + gather + table + _chunk_dedup_xla (everything the
               kernel launch consumes)

Deltas give: gather = sort_gather - sort_only, table = sort_table -
sort_only, dedup = full_prep - (sort_gather + table). Three interleaved
rounds guard against relay-floor drift. Run to completion; do not kill
mid-run.

Measurement caveats:
- `consume()` forces materialization via a full fp32 upcast + reduction,
  so the aug-consuming variants (sort_gather, full_prep) pay an extra
  payload-sized (~67 MB bf16) read/reduce the aug-free variants do not —
  the reported gather delta and absolute full_prep are slightly inflated
  (it cancels only in the dedup delta).
- per-stage deltas subtract a separately-measured per-round dispatch
  floor and can come out negative under run-to-run noise when a stage
  sits at the floor; the [split] line clamps at 0 and marks such stages
  with an explicit "~floor" tag.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _synth_points_realistic
    from pillarnet_lts_tpu.ops import scatter as scatter_mod
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk
    from pillarnet_lts_tpu.ops.voxelize import PillarSpec, voxelize_points

    # layout constants come from the shipped modules so the probe cannot
    # silently measure a stale layout if the defaults move
    CH = vk._MXU_CHUNK
    tile_rows = scatter_mod._MXU_TILE_ROWS
    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    # PROBE_N: smaller sizes for CPU sanity runs of the probe itself
    N, C, H, W = int(os.environ.get("PROBE_N", 262144)), 32, 1440, 1440
    hw = H * W
    tile_pillars = tile_rows * W
    num_tiles = -(-H // tile_rows)
    # same pad rule as _scatter_mxu_impl (pack=1): [feats | occ | 0...]
    c_pad = max(128, -(-(C + 3) // 128) * 128)
    pdt = jnp.bfloat16

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

    def consume(*xs):
        out = jax.lax.optimization_barrier(xs)
        return sum(x.astype(jnp.float32).sum() for x in out)

    pad_n = -(-(N + CH) // (8 * CH)) * 8 * CH - N

    def sort_part(ids, ok):
        key = jnp.where(ok, ids, hw).astype(jnp.int32)
        sorted_key, order = jax.lax.sort_key_val(
            key, jnp.arange(N, dtype=jnp.int32)
        )
        return key, sorted_key, order

    def gather_part(feats, ok, order):
        payload = jnp.concatenate(
            [feats.astype(pdt) * ok[:, None].astype(pdt),
             ok[:, None].astype(pdt)], axis=-1)
        row = jnp.concatenate(
            [payload, jnp.zeros((N, c_pad - payload.shape[1]), pdt)],
            axis=-1)
        row = jnp.concatenate([row, jnp.zeros((1, c_pad), pdt)])
        order_p = jnp.concatenate(
            [order, jnp.full((pad_n,), N, jnp.int32)])
        return jnp.take_along_axis(row, order_p[:, None], axis=0)

    def table_part(sorted_key):
        sorted_ids = jnp.concatenate(
            [sorted_key, jnp.full((pad_n,), hw, jnp.int32)])
        tile_bounds = (
            jnp.arange(num_tiles + 1, dtype=jnp.int32) * tile_pillars)
        tile_starts = jnp.searchsorted(
            sorted_ids[:N], tile_bounds, side="left").astype(jnp.int32)
        starts, ends = tile_starts[:-1], tile_starts[1:]
        astarts = (starts // CH) * CH
        real = jnp.where(
            ends > starts, -(-(ends - astarts) // CH), 0).astype(jnp.int32)
        nct = jnp.maximum(real, 1)
        cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(nct, dtype=jnp.int32)])
        S = (N + pad_n) // CH + num_tiles
        s_idx = jnp.arange(S, dtype=jnp.int32)
        t_of = jnp.clip(
            jnp.searchsorted(cum, s_idx, side="right").astype(jnp.int32) - 1,
            0, num_tiles - 1)
        off = s_idx - cum[t_of]
        first = (off == 0).astype(jnp.int32)
        g_of = jnp.clip(astarts[t_of] // CH + off, 0,
                        (N + pad_n) // CH - 1)
        valid_s = (off < real[t_of]).astype(jnp.int32)
        return jnp.stack([t_of, g_of, first, valid_s]), sorted_ids

    @jax.jit
    def sort_only(f, i, o):
        _, sorted_key, order = sort_part(i[0], o[0])
        return consume(sorted_key, order)

    @jax.jit
    def sort_gather(f, i, o):
        _, sorted_key, order = sort_part(i[0], o[0])
        aug = gather_part(f[0], o[0], order)
        return consume(sorted_key, aug)

    @jax.jit
    def sort_table(f, i, o):
        _, sorted_key, order = sort_part(i[0], o[0])
        tbl, sorted_ids = table_part(sorted_key)
        return consume(order, tbl, sorted_ids)

    @jax.jit
    def full_prep(f, i, o):
        _, sorted_key, order = sort_part(i[0], o[0])
        aug = gather_part(f[0], o[0], order)
        tbl, sorted_ids = table_part(sorted_key)
        aug = vk._chunk_dedup_xla(aug, sorted_ids, CH)
        return consume(aug, tbl)

    # --- dispatch floor (same protocol as bench.py) -----------------------
    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros(())
    float(np.asarray(tiny(z)))

    def floor_now():
        fl = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(np.asarray(tiny(z)))
            fl.append(time.perf_counter() - t0)
        return float(np.median(fl))

    variants = [("sort_only", sort_only), ("sort_gather", sort_gather),
                ("sort_table", sort_table), ("full_prep", full_prep)]
    for name, fn in variants:  # compile pass
        t0 = time.perf_counter()
        s = float(np.asarray(fn(featsd, idsd, okd)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
              f"(checksum {s:.3e})", flush=True)

    res = {n: [] for n, _ in variants}
    for rnd in range(3):  # interleaved rounds vs per-round floor
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.2f}"]
        for name, fn in variants:
            times = []
            for _ in range(8):
                t0 = time.perf_counter()
                float(np.asarray(fn(featsd, idsd, okd)))
                times.append(time.perf_counter() - t0)
            t = (float(np.median(times)) - floor) * 1000
            res[name].append(t)
            line.append(f"{name} {t:.2f}")
        print(" | ".join(line) + " ms on-chip", flush=True)

    med = {n: float(np.median(v)) for n, v in res.items()}
    # per-variant spread across rounds ~ floor variance; deltas within it
    # are indistinguishable from the floor — clamp at 0 and tag them
    spread = float(np.median(
        [np.ptp(v) if len(v) > 1 else 0.0 for v in res.values()]
    ))

    def fmt(delta):
        if delta <= max(spread, 0.15):
            return f"{max(delta, 0.0):.2f}(~floor)"
        return f"{delta:.2f}"

    gather_d = med["sort_gather"] - med["sort_only"]
    table_d = med["sort_table"] - med["sort_only"]
    dedup_d = med["full_prep"] - med["sort_gather"] - table_d
    print(f"[split] sort={fmt(med['sort_only'])} "
          f"gather={fmt(gather_d)} table={fmt(table_d)} "
          f"dedup+rest={fmt(dedup_d)} "
          f"full_prep={med['full_prep']:.2f} ms "
          f"(round spread ~{spread:.2f})", flush=True)


if __name__ == "__main__":
    main()
