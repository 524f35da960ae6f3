"""Round-4 on-chip probe: eval W-tiling chunk count under int8.

chunk_nc=8 was chosen in round 2 on the bf16 graph; int8 halves the
activation bytes each chunk moves, so the halo-overhead vs relayout
trade may have shifted. Compile the FULL int8 eval graph at chunk_nc in
{4, 8, 16}, then interleave timing rounds (same-session comparisons only
— the relay floor drifts, docs/ROADMAP.md).

Usage: python tools/bench_r4_chunk_probe.py [chunk_nc ...]  (default 4 8 16)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    chunk_ncs = [int(a) for a in sys.argv[1:]] or [4, 8, 16]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _synth_points_realistic
    from pillarnet_lts_tpu.apis import build_model_from_cfg
    from pillarnet_lts_tpu.runtime.quantize import (
        calibrate,
        enable_backbone_quant,
    )
    from pillarnet_lts_tpu.utils.config import Config

    @jax.jit
    def tiny(x):
        return (x + 1).sum()

    z = jnp.ones((8, 128))
    float(np.asarray(tiny(z)))

    def floor_now():
        fs = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(np.asarray(tiny(z)))
            fs.append(time.perf_counter() - t0)
        return float(np.median(fs))

    clouds = None
    fns = {}
    ref_scores = None
    for nc in chunk_ncs:
        cfg = Config.fromfile("configs/pillarnet/pillarnet34_nusc_int8.py")
        enable_backbone_quant(cfg.model)
        cfg.model["backbone"]["chunk_nc"] = nc
        model = build_model_from_cfg(cfg)
        test_cfg = model.processed_test_cfg()

        if clouds is None:
            clouds = []
            for seed in range(4):
                p, m = _synth_points_realistic(
                    1, cfg.data["max_points"], cfg.point_cloud_range,
                    seed=seed,
                )
                clouds.append((jnp.asarray(p), jnp.asarray(m)))

        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), *clouds[0], train=False
        )
        variables = calibrate(
            model,
            {k: v for k, v in variables.items() if k != "quant"},
            clouds[:2],
        )
        jax.block_until_ready(variables)

        def make_fn(model=model, test_cfg=test_cfg):
            @jax.jit
            def fn(v, points, points_mask):
                preds = model.apply(v, points, points_mask, train=False)
                return model.predict({}, preds, test_cfg)
            return fn

        fn = make_fn()
        t0 = time.perf_counter()
        try:
            out = fn(variables, *clouds[0])
            s = np.asarray(out["scores"])
        except Exception as e:
            print(f"[compile] chunk_nc={nc} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"[compile] chunk_nc={nc}: {time.perf_counter() - t0:.1f}s "
              f"(top score {float(s.max()):.4f})", flush=True)
        # chunking is numerics-exact: identical params => identical output
        if ref_scores is None:
            ref_scores = s
        else:
            d = float(np.max(np.abs(s - ref_scores)))
            print(f"  max |scores - ref| = {d:.2e}", flush=True)
        fns[nc] = (fn, variables)

    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.2f} ms"]
        for nc, (fn, variables) in fns.items():
            p, m = clouds[rnd % len(clouds)]
            fn(variables, p, m)  # warm
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                np.asarray(fn(variables, p, m)["scores"])
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            line.append(
                f"nc{nc} {med * 1000:.2f} (on-chip "
                f"{(med - floor) * 1000:.2f})"
            )
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
