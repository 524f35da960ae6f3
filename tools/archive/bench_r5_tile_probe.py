"""Round-5 probe #3: pick the eval W-tiling batch threshold.

bench_r5_bs8_probe measured untiled (backbone.chunk_nc=0) 3.9 ms/frame
faster than tiled at bs=8 (34.9 vs 38.8 on-chip int8): at batch 8 XLA's
convs are already batched, so the overlapped W-tiles' 15-20% halo
recompute + chunk/unchunk relayouts are pure overhead. Round 2/3 measured
the OPPOSITE at bs=1/bs=4 (untiled bs=4 ran 10.4 vs 15 FPS) — but on the
pre-H-pack pre-int8 graph. Same-session A/B of tiled-vs-untiled at bs=1
and bs=4 on today's int8 graph to place the `chunk_gate` eval threshold.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    from pillarnet_lts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from __graft_entry__ import _synth_points_realistic
    from pillarnet_lts_tpu.apis import build_model_from_cfg
    from pillarnet_lts_tpu.runtime.quantize import (
        calibrate,
        enable_backbone_quant,
    )
    from pillarnet_lts_tpu.utils.config import Config

    cfg_path = os.path.join(ROOT, "configs/pillarnet/pillarnet34_nusc_int8.py")

    def build(untiled):
        cfg = Config.fromfile(cfg_path)
        enable_backbone_quant(cfg.model)
        if untiled:
            cfg.model["backbone"]["chunk_nc"] = 0
        model = build_model_from_cfg(cfg)
        test_cfg = model.processed_test_cfg()

        @jax.jit
        def fn(v, p, m):
            preds = model.apply(v, p, m, train=False)
            return model.predict({}, preds, test_cfg)
        return model, fn, cfg

    model0, fn_tiled, cfg = build(False)
    _, fn_untiled, _ = build(True)

    clouds = []
    for seed in range(4):
        p, m = _synth_points_realistic(
            1, cfg.data["max_points"], cfg.point_cloud_range, seed=seed)
        clouds.append((jnp.asarray(p), jnp.asarray(m)))
    p4 = jnp.concatenate([p for p, _ in clouds], axis=0)
    m4 = jnp.concatenate([m for _, m in clouds], axis=0)

    variables = jax.jit(model0.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *clouds[0], train=False
    )
    base = {k: v for k, v in variables.items() if k != "quant"}
    t0 = time.perf_counter()
    vq = calibrate(model0, base, clouds[:2])
    print(f"[calibrate] {time.perf_counter() - t0:.1f}s", flush=True)

    cases = [
        ("tiled_bs1", fn_tiled, clouds[0], 1),
        ("untiled_bs1", fn_untiled, clouds[0], 1),
        ("tiled_bs4", fn_tiled, (p4, m4), 4),
        ("untiled_bs4", fn_untiled, (p4, m4), 4),
    ]
    for name, fn, args, _bs in cases:
        t0 = time.perf_counter()
        np.asarray(fn(vq, *args)["scores"])
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    tiny = jax.jit(lambda a: (a + 1).sum())
    z = jnp.ones((8, 128))
    float(np.asarray(tiny(z)))

    def floor_now():
        fl = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(np.asarray(tiny(z)))
            fl.append(time.perf_counter() - t0)
        return float(np.median(fl))

    res = {n: [] for n, *_ in cases}
    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.1f}"]
        for name, fn, args, bs in cases:
            ts = []
            for i in range(6):
                a = (clouds[i % 4] if bs == 1 else args)
                t0 = time.perf_counter()
                np.asarray(fn(vq, *a)["scores"])
                ts.append(time.perf_counter() - t0)
            t = (float(np.median(ts)) - floor) * 1000 / bs
            res[name].append(t)
            line.append(f"{name} {t:.2f}")
        print(" | ".join(line) + " ms on-chip/frame", flush=True)

    med = {n: float(np.median(v)) for n, v in res.items()}
    print("[split] " + " ".join(f"{n}={v:.2f}" for n, v in med.items()),
          flush=True)


if __name__ == "__main__":
    main()
