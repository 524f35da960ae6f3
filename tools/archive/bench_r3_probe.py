"""ARCHIVED round-3 experiment log (kept as the record of the measurements
cited in docs/ROADMAP.md; superseded by tools/bench_r4_probe.py — the
round-4 decomposition overturned this probe's per-slot-DMA conclusion).
Not maintained; prefer tools/profile_tpu.py for per-phase budgets.

Two decision questions, each measured against the per-run dispatch floor:

1. Scatter slot-count sensitivity: the chunk-scheduled MXU scatter issues
   one grid step per (tile, chunk) slot plus one mandatory zero-init slot
   per tile. tile_rows sets the tile count (1440/tile_rows), so sweeping it
   with realistic radially-distributed pillar ids separates per-slot
   overhead from compute. The round-3 sweep was called "flat within relay
   variance"; this probe times many iterations and subtracts the measured
   floor so a 1-2 ms signal is resolvable.

2. int8 conv-chain epilogue fusion: the deployed int8 form dequantizes each
   conv's int32 output to bf16 (BN fold + bias + mask + relu) and
   re-quantizes at the next conv. If XLA fails to fuse the re-quantize into
   the producing conv's epilogue, every conv pays an extra full-tensor
   read/write. Variant B folds the next conv's activation scale into the
   dequant vector and emits int8 directly (residual carried separately),
   which removes the bf16 intermediate entirely. If B wins by >= 1 ms at
   the conv2-stage shape, the model's block path should chain int8.

Run to completion; do not kill mid-run (a stale claim wedges the chip).
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
    from jax import lax

    from __graft_entry__ import _synth_points_realistic
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_mxu,
    )
    from pillarnet_lts_tpu.ops.voxelize import PillarSpec, voxelize_points

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

    # --- 1. scatter tile_rows sweep, realistic ids ------------------------
    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    N, C, H, W = 262144, 32, 1440, 1440
    pts, mask = _synth_points_realistic(1, N, pc_range)
    spec = PillarSpec(0.075, pc_range)

    @jax.jit
    def prep(p, m, key):
        feats, ids, ok = voxelize_points(p, m, spec)
        # post-ReLU-like nonneg payload of the PFE's width
        f = jax.nn.relu(
            jax.random.normal(key, (1, N, C), jnp.bfloat16)
        )
        return f, ids, ok

    featsd, idsd, okd = prep(
        jnp.asarray(pts), jnp.asarray(mask), jax.random.PRNGKey(0)
    )
    featsd = jax.block_until_ready(featsd)

    for tr in (2, 4, 8, 16):
        @jax.jit
        def scat(f, i, o, tr=tr):
            g, occ = pillar_scatter_max_mxu(
                f, i, o, H, W, tr, True, 1
            )
            return g.astype(jnp.float32).sum() + occ.sum()

        timeit(f"mxu scatter nonneg tile_rows={tr}", scat, featsd, idsd, okd)

    # --- 2. int8 chain fusion A/B -----------------------------------------
    key = jax.random.PRNGKey(1)

    def qchain_ab(hw, ch, nconv, name):
        xb = jax.jit(
            lambda k: jax.nn.relu(
                jax.random.normal(k, (1, hw, hw, ch), jnp.bfloat16))
        )(key)
        wi = jax.jit(
            lambda k: jax.random.randint(
                k, (3, 3, ch, ch), -127, 127, jnp.int8)
        )(key)
        # per-output-channel dequant vector (BN fold included), bias, and a
        # precomputed additive -inf re-zero mask channel-expanded like the
        # stage path materializes it
        dq = jax.jit(
            lambda k: jax.random.uniform(k, (ch,), jnp.float32, 1e-4, 2e-4)
        )(key)
        bias = jax.jit(
            lambda k: jax.random.normal(k, (ch,), jnp.float32) * 0.01
        )(key)
        negc = jax.jit(
            lambda k: jnp.where(
                jax.random.uniform(k, (1, hw, hw, 1)) > 0.3,
                0.0, -3e38,
            ).astype(jnp.bfloat16) * jnp.ones((ch,), jnp.bfloat16)
        )(key)
        sx = jnp.float32(0.05)

        def conv_i8(q, w):
            return lax.conv_general_dilated(
                q, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        @jax.jit
        def chain_a(x, w, d, b, m):
            # deployed form: per-conv quantize -> conv -> dequant(+bias)
            # -> +negc mask -> relu, residual add every 2 convs
            ident = x
            for i in range(nconv):
                q = jnp.clip(
                    jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                    -127, 127).astype(jnp.int8)
                y = conv_i8(q, w)
                y = (y.astype(jnp.float32) * (sx * d) + b).astype(
                    jnp.bfloat16)
                y = y + m
                if i % 2 == 1:
                    x = jax.nn.relu(y + ident)
                    ident = x
                else:
                    x = jax.nn.relu(y)
            return x.astype(jnp.float32).sum()

        timeit(f"{name} A deployed x{nconv}", chain_a, xb, wi, dq, bias,
               negc)

        @jax.jit
        def chain_b(x, w, d, b, m):
            # int8-chained form: fold the NEXT conv's activation scale into
            # the dequant vector and emit int8 directly; the residual rides
            # as int8 too (same scale), added in int32 before requant
            q = jnp.clip(
                jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                -127, 127).astype(jnp.int8)
            identq = q
            mq = (m < 0)  # boolean inactive mask
            for i in range(nconv):
                y = conv_i8(q, w)
                # fold dequant+bias+requant: int32 -> int8 in one pass
                yf = y.astype(jnp.float32) * (sx * d / sx) + b / sx
                if i % 2 == 1:
                    yf = yf + identq.astype(jnp.float32)
                yf = jnp.where(mq, 0.0, yf)
                q = jnp.clip(jnp.round(jax.nn.relu(yf)), 0, 127).astype(
                    jnp.int8)
                if i % 2 == 1:
                    identq = q
            return q.astype(jnp.float32).sum()

        timeit(f"{name} B int8-chained x{nconv}", chain_b, xb, wi, dq,
               bias, negc)

    qchain_ab(720, 64, 8, "conv2-like(720^2x64)")
    qchain_ab(720, 128, 6, "conv1-s2d-like(720^2x128)")


if __name__ == "__main__":
    main()
