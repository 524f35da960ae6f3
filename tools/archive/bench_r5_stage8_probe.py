"""Round-5 probe #5: re-derive the stage ledger AT THE SERVING SHAPE
(int8, bs=8, untiled eval — the shipped round-5 serving configuration).

The 31-35 ms/frame on-chip floor in BASELINE.md was summed from bs=1
W-tiled stage probes (rounds 2-4). Round 5 ships a different execution
shape at the serving optimum — batch 8, no W-tiling, int8 scatter payload
— so the per-stage distribution may have moved. Cumulative DCE stages
(summing only stage K's output lets XLA drop deeper stages, as in
tools/profile_tpu.py), per-round floors, 3 interleaved rounds, all
numbers divided by 8 to ms/frame.

Reference protocol anchor: `/root/reference/tools/dist_test.py:146-157`.
Run to completion — never kill mid-run (stale claims wedge the chip).

MEASURED (2026-08-20, 3 rounds, per-round floors 26.6-27.9 ms; medians,
ms/frame on-chip, cumulative-DCE deltas):

  reader (voxelize+PFE+int8 scatter) 12.2 | +conv1 7.8 | +conv2 3.7
  | +conv3 2.5 | +conv4 0.6 | +conv5 0.4 | +neck 0.8 | +head 1.8
  | +decode/NMS/final-select 4.1 | full 33.8

Round-to-round spread <= 0.4 ms on every row except conv2 (one 26.5
outlier round vs 23.6/23.6 cumulative — the delta uses the median).
The full graph (33.8 under a scalar sink; 34.9 with the real detection
copy-out, bench_r5_bs8_probe.py) sits inside the 31-35 ms bs=1-derived
ledger floor: the serving shape is fully accounted, no stage moved
anomalously under batch-8 untiled execution. Usual caveat: cumulative
DCE cuts make int8 per-stage deltas indicative, not exact (a graph cut
at stage K pays a final dequant/relayout the full graph fuses away).
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
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

    cfg = Config.fromfile(
        os.path.join(ROOT, "configs/pillarnet/pillarnet34_nusc_int8.py"))
    enable_backbone_quant(cfg.model)
    model = build_model_from_cfg(cfg)
    test_cfg = model.processed_test_cfg()

    clouds = []
    for seed in range(4):
        p, m = _synth_points_realistic(
            1, cfg.data["max_points"], cfg.point_cloud_range, seed=seed)
        clouds.append((jnp.asarray(p), jnp.asarray(m)))
    p8 = jnp.concatenate([p for p, _ in clouds] * 2, axis=0)
    m8 = jnp.concatenate([m for _, m in clouds] * 2, axis=0)

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *clouds[0], train=False)
    base = {k: v for k, v in variables.items() if k != "quant"}
    t0 = time.perf_counter()
    vq = calibrate(model, base, clouds[:2])
    print(f"[calibrate] {time.perf_counter() - t0:.1f}s", flush=True)

    def reader_fn(v, p, m):
        g, o = model.apply(
            v, p, m, False,
            method=lambda mdl, p_, m_, tr: mdl.reader_net(p_, m_, tr))
        return g.sum() + o.sum()

    def stage_fn(stage):
        def f(v, p, m):
            def m_(mdl, p_, m2, tr):
                g, o = mdl.reader_net(p_, m2, tr)
                feats = mdl.backbone_net(g, o, tr)
                return feats[stage][0].sum()
            return model.apply(v, p, m, False, method=m_)
        return f

    def neck_fn(v, p, m):
        def m_(mdl, p_, m2, tr):
            bev, _ = mdl.extract_feat(p_, m2, tr)
            return sum(x.sum() for x in jax.tree_util.tree_leaves(bev))
        return model.apply(v, p, m, False, method=m_)

    def head_fn(v, p, m):
        preds = model.apply(v, p, m, train=False)
        return sum(x.sum() for pd in preds for x in pd.values())

    def full_fn(v, p, m):
        preds = model.apply(v, p, m, train=False)
        det = model.predict({}, preds, test_cfg)
        return det["scores"].sum() + det["box3d_lidar"].sum()

    jobs = [("reader", jax.jit(reader_fn))]
    for st in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        jobs.append((st, jax.jit(stage_fn(st))))
    jobs += [("neck", jax.jit(neck_fn)), ("head", jax.jit(head_fn)),
             ("full", jax.jit(full_fn))]

    for name, fn in jobs:
        t0 = time.perf_counter()
        s = float(np.asarray(fn(vq, p8, m8)))
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s "
              f"(checksum {s:.3e})", flush=True)

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

    res = {n: [] for n, _ in jobs}
    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.1f}"]
        for name, fn in jobs:
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(np.asarray(fn(vq, p8, m8)))
                ts.append(time.perf_counter() - t0)
            t = (float(np.median(ts)) - floor) * 1000 / 8
            res[name].append(t)
            line.append(f"{name} {t:.2f}")
        print(" | ".join(line) + " ms/frame on-chip", flush=True)

    med = {n: float(np.median(v)) for n, v in res.items()}
    print("[cum] " + " ".join(f"{n}={v:.2f}" for n, v in med.items()),
          flush=True)
    order = [n for n, _ in jobs]
    print("[deltas] " + " ".join(
        f"{b}-{a}={med[b] - med[a]:+.2f}"
        for a, b in zip(order, order[1:])), flush=True)


if __name__ == "__main__":
    main()
