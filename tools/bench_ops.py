"""Consolidated TPU micro-benchmarks, one process, ordered by importance.

Enables the persistent compilation cache so repeated runs skip the remote
compile. Run to completion — do not kill mid-run (wedges the chip claim).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from pillarnet_lts_tpu.ops.iou3d import rotated_iou_bev, to_pcdet_bev
    from pillarnet_lts_tpu.ops.nms import _greedy_suppress, rotated_nms
    from pillarnet_lts_tpu.ops.voxelize import scatter_max_to_grid
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_pallas,
    )

    rng = np.random.RandomState(0)

    def timeit(name, fn, *fargs, iters=4):
        t0 = time.perf_counter()
        float(np.asarray(fn(*fargs)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(fn(*fargs)))
            times.append(time.perf_counter() - t0)
        print(f"[steady]  {name}: {np.mean(times) * 1000:.1f} ms", flush=True)

    # --- NMS components --------------------------------------------------
    K = 1000
    boxes = np.zeros((K, 9), np.float32)
    boxes[:, 0:2] = rng.uniform(-50, 50, (K, 2))
    boxes[:, 3:6] = rng.uniform(1, 4, (K, 3))
    boxes[:, 8] = rng.uniform(-3, 3, K)
    boxes_j = jnp.asarray(boxes)
    scores_j = jnp.asarray(rng.rand(K).astype(np.float32))
    valid_j = jnp.ones(K, bool)

    @jax.jit
    def iou_fn(b):
        bev = to_pcdet_bev(b)
        return rotated_iou_bev(bev, bev).sum()

    timeit("rotated IoU 1000x1000", iou_fn, boxes_j)

    @jax.jit
    def nms_fn(b, s, v):
        idx, m = rotated_nms(b, s, v, 0.2, 83)
        return idx.sum() + m.sum()

    timeit("rotated NMS full", nms_fn, boxes_j, scores_j, valid_j)

    # --- voxelize scatter: XLA vs Pallas ---------------------------------
    N, C, H, W = 262144, 32, 1440, 1440
    feats = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    ids = jnp.asarray(
        rng.randint(0, H * W, (1, N)).astype(np.int32)
    )
    ok = jnp.asarray(rng.rand(1, N) > 0.05)

    @jax.jit
    def scat_xla(f, i, o):
        g, occ = scatter_max_to_grid(f, i, o, H, W)
        return g.sum() + occ.sum()

    timeit("scatter-max XLA (262k -> 1440^2)", scat_xla, feats, ids, ok)

    @jax.jit
    def scat_pallas(f, i, o):
        g, occ = pillar_scatter_max_pallas(f, i, o, H, W)
        return g.sum() + occ.sum()

    timeit("scatter-max Pallas (262k -> 1440^2)", scat_pallas, feats, ids, ok)

    # --- int8 vs bf16 conv cores (deploy-path decision numbers) ----------
    # conv1 runs s2d (720^2 x 128) and conv2 fine (720^2 x 64) in the
    # flagship model; the int8 deploy path wins iff the MXU's double-rate
    # int8 mode survives XLA's conv lowering at these shapes.
    from jax import lax

    key = jax.random.PRNGKey(0)

    def conv_ab(hw, cin, cout, nconv, name):
        xb = jax.jit(
            lambda k: jax.random.normal(k, (1, hw, hw, cin), jnp.bfloat16)
        )(key)
        wb = jax.jit(
            lambda k: jax.random.normal(k, (3, 3, cin, cout), jnp.bfloat16)
            * 0.1
        )(key)

        @jax.jit
        def chain_bf(x, w):
            for _ in range(nconv):
                x = jax.nn.relu(lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
            return x.astype(jnp.float32).sum()

        timeit(f"{name} bf16 x{nconv}", chain_bf, xb, wb)

        wi = jax.jit(
            lambda k: jax.random.randint(k, (3, 3, cin, cout), -127, 127,
                                         jnp.int8)
        )(key)
        sx = jnp.float32(0.05)

        @jax.jit
        def chain_i8(x, w):
            acc = x
            for _ in range(nconv):
                q = jnp.clip(
                    jnp.round(acc.astype(jnp.float32) * (1.0 / sx)),
                    -127, 127,
                ).astype(jnp.int8)
                y = lax.conv_general_dilated(
                    q, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                acc = jax.nn.relu(
                    (y.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16))
            return acc.astype(jnp.float32).sum()

        timeit(f"{name} int8(deployed form) x{nconv}", chain_i8, xb, wi)

    conv_ab(720, 128, 128, 6, "conv1-s2d(720^2x128)")
    conv_ab(720, 64, 64, 8, "conv2(720^2x64)")


if __name__ == "__main__":
    main()
