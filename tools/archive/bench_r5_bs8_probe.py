"""Round-5 probe #2: attack the measured bs=8 on-chip residual.

bench_r5_pipe_probe.py established that the bs=8 int8 serving graph is
dispatch-clean (serial on-chip/frame == pipelined at every queue depth =
38.7 ms vs the 31-35 ms stage-ledger floor), so the residual is whole-graph
on-chip compute. Same-session A/B of the candidate reducers:

  base      shipped config (W-tiling on, exact top-k, nms_sweeps=16)
  untiled   backbone.chunk_nc=0 — at batch 8 the convs are already batched,
            so the W-tiling's raison d'etre (keeping XLA's space-to-batch
            form for batch-1 graphs) may not apply and its 15-20% halo
            recompute + chunk/unchunk relayouts may be pure overhead
  nmstrim   test_cfg.nms: approx_topk=True (lax.approx_max_k, recall 0.99)
            + nms_sweeps 16 -> 8 (convergence asserted separately in the
            mAP study) — spends the ~3.5 ms decode+NMS budget deliberately
  both      untiled + nmstrim

All int8 (scatter payload on), bs=8, serial per-batch timing (proven equal
to pipelined), 3 interleaved rounds vs per-round floor.
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

    def build(untiled=False, nmstrim=False):
        cfg = Config.fromfile(cfg_path)
        enable_backbone_quant(cfg.model)
        if untiled:
            cfg.model["backbone"]["chunk_nc"] = 0
        if nmstrim:
            cfg.test_cfg["nms"] = {**dict(cfg.test_cfg["nms"]),
                                   "approx_topk": True, "nms_sweeps": 8}
        model = build_model_from_cfg(cfg)
        test_cfg = model.processed_test_cfg()

        @jax.jit
        def fn(v, p, m):
            preds = model.apply(v, p, m, train=False)
            return model.predict({}, preds, test_cfg)
        return model, fn, cfg

    model0, fn_base, cfg = build()
    variants = [("base", fn_base)]
    for name, kw in (("untiled", dict(untiled=True)),
                     ("nmstrim", dict(nmstrim=True)),
                     ("both", dict(untiled=True, nmstrim=True))):
        variants.append((name, build(**kw)[1]))

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

    for name, fn in variants:
        t0 = time.perf_counter()
        np.asarray(fn(vq, p8, m8)["scores"])
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
