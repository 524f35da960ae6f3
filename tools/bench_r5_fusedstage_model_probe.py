"""Round-5 probe #10: fused Pallas s2d stage IN-MODEL (int8 flagship, bs=8).

The standalone stage A/B (tools/bench_r5_s2dconv_probe.py) measures the
XLA conv1 stage vs the fused whole-stage Pallas kernel
(`ops/pallas/s2d_conv_kernel.py::s2d_stage_int8`) at the serving shape.
This probe measures the same swap inside the full serving graph
(pillarnet34_nusc_int8, decode+NMS included) at bs=8 untiled — the shape
the headline `best_per_chip_fps` is quoted at:

  base    shipped int8 config (backbone.s2d_pallas=False — XLA s2d stage)
  fused   backbone.s2d_pallas=True (fused Pallas stage-1 kernel)

Prints a detection-output consistency check first (the kernel is
bit-exact to the XLA composite in interpret mode; on hardware the f32
dequant epilogue may contract to FMA, so scores are compared at 1e-2),
then 3 interleaved timing rounds against per-round dispatch floors.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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

    def build(fused):
        cfg = Config.fromfile(cfg_path)
        enable_backbone_quant(cfg.model)
        cfg.model["backbone"]["s2d_pallas"] = fused
        model = build_model_from_cfg(cfg)
        test_cfg = model.processed_test_cfg()

        @jax.jit
        def fn(v, p, m):
            preds = model.apply(v, p, m, train=False)
            return model.predict({}, preds, test_cfg)

        return model, fn, cfg

    model0, fn_base, cfg = build(False)
    _, fn_fused, _ = build(True)
    variants = [("base", fn_base), ("fused", fn_fused)]

    clouds = []
    for seed in range(4):
        p, m = _synth_points_realistic(
            1, cfg.data["max_points"], cfg.point_cloud_range, seed=seed)
        clouds.append((jnp.asarray(p), jnp.asarray(m)))
    p8 = jnp.concatenate([p for p, _ in clouds] * 2, axis=0)
    m8 = jnp.concatenate([m for _, m in clouds] * 2, axis=0)

    variables = jax.jit(model0.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *clouds[0], train=False
    )
    base = {k: v for k, v in variables.items() if k != "quant"}
    t0 = time.perf_counter()
    vq = calibrate(model0, base, clouds[:2])
    print(f"[calibrate] {time.perf_counter() - t0:.1f}s", flush=True)

    outs = {}
    for name, fn in variants:
        t0 = time.perf_counter()
        outs[name] = jax.device_get(fn(vq, p8, m8))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    sb, sf = outs["base"]["scores"], outs["fused"]["scores"]
    ds = float(np.max(np.abs(np.asarray(sb, np.float32)
                             - np.asarray(sf, np.float32))))
    print(f"[consistency] max |score delta| = {ds:.4g} "
          f"({'OK' if ds < 1e-2 else 'SUSPECT'})", flush=True)

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

    res = {n: [] for n, _ in variants}
    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.1f}"]
        for name, fn in variants:
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(fn(vq, p8, m8)["scores"])
                ts.append(time.perf_counter() - t0)
            t = (float(np.median(ts)) - floor) * 1000 / 8
            res[name].append(t)
            line.append(f"{name} {t:.2f}")
        print(" | ".join(line) + " ms on-chip/frame", flush=True)

    med = {n: float(np.median(v)) for n, v in res.items()}
    print("[split] " + " ".join(f"{n}={v:.2f}" for n, v in med.items()),
          flush=True)


if __name__ == "__main__":
    main()
