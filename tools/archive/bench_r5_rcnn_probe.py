"""Round-5 probe #4: the two-stage (PillarRCNN, 1504^2 Waymo) budget table
and the int8 serial regression attribution (judge item r4-#4/VERDICT #4).

BENCH_r04 recorded rcnn_int8_fps_bs1 10.45 < rcnn_fps_bs1 10.71 while the
pipelined int8 numbers WON (13.89 vs 13.06) — either relay-floor drift
across the two sub-runs (they ran minutes apart) or a real dequant cost in
the bf16 second stage consuming int8 first-stage features. Only a
same-session interleaved A/B can tell. One TPU process measures:

  1. stage budget, bf16 + int8: first-stage forward (reader+backbone+neck+
     head), + proposal decode/NMS, full two-stage (BEV RoI pooling + RoIMIX
     head + rescoring) — per-round floors, 3 interleaved rounds;
  2. bs=8 pipelined serving for both dtypes: the round-5 batch-aware
     W-tiling gate (`chunk_gate`, untiled at batch >= 8) was measured on
     the 1440^2 flagship (38.8 -> 34.9 ms/frame); the 1504^2 rcnn graph
     gets the same gate automatically — guard with try/except (the remote
     compile helper has died on very large graphs before, flagship bs=16).

Reference protocol anchor: `/root/reference/tools/dist_test.py:146-157`;
two-stage structure `/root/reference/det3d/models/detectors/
pillar_rcnn.py:85-166`.

Run to completion — never kill mid-run (stale claims wedge the chip).

MEASURED (TPU v5e, 2026-08-20, 3 interleaved rounds, per-round floors
24.6-26.7 ms; on-chip ms):

  [budget] bf16: first=64.2  +prop=70.5  full=69.2
           int8: first=49.0  +prop=53.0  full=54.4
  [split:bf16] first 64.2 | proposal decode/NMS +6.3 | second stage ~0
               (-1.2, within round spread)
  [split:int8] first 49.0 | proposal decode/NMS +4.0 | second stage +1.5

  bs=4: bf16 72.5 ms/frame (13.8 FPS) | int8 53.2 (18.8 FPS)
  bs=8: bf16 compile FAILED (remote compile helper HTTP 500 — same
        big-graph limit as flagship bs=16); int8 40.9 ms/frame on-chip
        = 24.5 FPS/chip (batch-aware untiled gate active)

Attribution of the BENCH_r04 serial regression (rcnn_int8_fps_bs1 10.45 <
bf16 10.71): RELAY-FLOOR DRIFT between the two sub-runs, not dequant cost
— same-session int8 full is 15 ms FASTER than bf16 (54.4 vs 69.2), and
the bf16 second stage consuming int8 first-stage features costs nothing
measurable (~0-1.5 ms, within round spread, both dtypes).
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

import numpy as np


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

    cfg_path = os.path.join(ROOT, "configs/pillarrcnn/pillarrcnn18_waymo.py")

    def leaves_sum(t):
        return sum(x.sum() for x in jax.tree_util.tree_leaves(t)
                   if hasattr(x, "sum"))

    def build(int8):
        cfg = Config.fromfile(cfg_path)
        if int8:
            enable_backbone_quant(cfg.model)
        model = build_model_from_cfg(cfg)

        @jax.jit
        def first(v, p, m):
            def m_(mdl, p_, m2, tr):
                preds, bev, feats = mdl.single_det.forward_two_stage(
                    p_, m2, train=tr)
                return leaves_sum(preds) + leaves_sum(bev) + leaves_sum(feats)
            return model.apply(v, p, m, False, method=m_)

        @jax.jit
        def prop(v, p, m):
            def m_(mdl, p_, m2, tr):
                preds, bev, feats = mdl.single_det.forward_two_stage(
                    p_, m2, train=tr)
                det = mdl.single_det.predict(
                    {}, preds, mdl.single_det.processed_test_cfg())
                return leaves_sum(det) + leaves_sum(bev)
            return model.apply(v, p, m, False, method=m_)

        @jax.jit
        def full(v, p, m):
            out = model.apply(v, p, m, train=False)
            det = model.post_process(out)
            return det["scores"].sum() + det["box3d_lidar"].sum()

        @jax.jit
        def full_out(v, p, m):
            out = model.apply(v, p, m, train=False)
            return model.post_process(out)

        return cfg, model, {"first": first, "+prop": prop, "full": full,
                            "serve": full_out}

    cfg, model_bf, fns_bf = build(int8=False)
    _, model_i8, fns_i8 = build(int8=True)

    clouds = []
    for seed in range(4):
        p, m = _synth_points_realistic(
            1, cfg.data["max_points"], cfg.point_cloud_range, seed=seed)
        clouds.append((jnp.asarray(p), jnp.asarray(m)))

    v_bf = jax.jit(model_bf.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *clouds[0], train=False)
    base = {k: v for k, v in v_bf.items() if k != "quant"}
    t0 = time.perf_counter()
    v_i8 = calibrate(model_i8, base, clouds[:2])
    print(f"[calibrate] {time.perf_counter() - t0:.1f}s", flush=True)

    jobs = []  # (label, fn, vars)
    for nm, fn in fns_bf.items():
        if nm != "serve":
            jobs.append((f"bf16:{nm}", fn, v_bf))
    for nm, fn in fns_i8.items():
        if nm != "serve":
            jobs.append((f"int8:{nm}", fn, v_i8))

    for label, fn, v in jobs:
        t0 = time.perf_counter()
        float(np.asarray(fn(v, *clouds[0])))
        print(f"[compile] {label}: {time.perf_counter() - t0:.1f}s",
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

    res = {lbl: [] for lbl, _, _ in jobs}
    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.1f}"]
        for label, fn, v in jobs:
            ts = []
            for i in range(4):
                p, m = clouds[i % len(clouds)]
                t0 = time.perf_counter()
                float(np.asarray(fn(v, p, m)))
                ts.append(time.perf_counter() - t0)
            t = (float(np.median(ts)) - floor) * 1000
            res[label].append(t)
            line.append(f"{label} {t:.1f}")
        print(" | ".join(line) + " ms on-chip", flush=True)

    med = {lbl: float(np.median(v)) for lbl, v in res.items()}
    print("[budget] " + " ".join(f"{lbl}={v:.1f}" for lbl, v in med.items()),
          flush=True)
    for tag in ("bf16", "int8"):
        f1 = med[f"{tag}:first"]
        fp = med[f"{tag}:+prop"]
        ff = med[f"{tag}:full"]
        print(f"[split:{tag}] first={f1:.1f} prop_decode_nms={fp - f1:.1f} "
              f"second_stage={ff - fp:.1f} total={ff:.1f}", flush=True)

    # --- bs=8 serving attempt (batch-aware untiled gate) -----------------
    p8 = jnp.concatenate([p for p, _ in clouds] * 2, axis=0)
    m8 = jnp.concatenate([m for _, m in clouds] * 2, axis=0)
    p4 = jnp.concatenate([p for p, _ in clouds], axis=0)
    m4 = jnp.concatenate([m for _, m in clouds], axis=0)
    for tag, fn, v in (("bf16", fns_bf["serve"], v_bf),
                       ("int8", fns_i8["serve"], v_i8)):
        for bs, pb, mb in ((4, p4, m4), (8, p8, m8)):
            try:
                t0 = time.perf_counter()
                np.asarray(fn(v, pb, mb)["scores"])
                print(f"[compile] {tag} bs={bs}: "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                floor = floor_now()
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    np.asarray(fn(v, pb, mb)["scores"])
                    ts.append(time.perf_counter() - t0)
                t = (float(np.median(ts)) - floor) * 1000 / bs
                print(f"[bs{bs}:{tag}] {t:.2f} ms/frame on-chip = "
                      f"{1000.0 / t:.2f} FPS (floor {floor * 1000:.1f})",
                      flush=True)
            except Exception as e:
                print(f"[bs{bs}:{tag}] FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
