"""Round-5 probe: (A) int8 scatter payload in-model A/B, (B) pipelined
bs=8 steady-state decomposition (judge items r4-#1a/#1b).

BENCH_r04's best number is int8 pipelined bs=8 = 24.4 FPS = 41 ms/frame
against BASELINE.md's derived on-chip floor of 31-35 ms/frame; the ~6-10
ms/frame residual was never decomposed. Candidates: relay dispatch not
fully overlapped at queue depth 2, the per-batch host copy-out of the
detection tensors, or simply more on-chip time than the floor estimate.
This probe measures, same-session, against a per-round dispatch floor:

  A. serial bs=1 on-chip p50 of the int8 model with the reader's int8
     scatter payload ON vs OFF (3 interleaved rounds) + output equality —
     the in-model adjudication of the round-4 "named lever" (~1.5-2 ms
     candidate from halved gather + chunk-DMA bytes).
  B. bs=8 graph (payload winner): serial per-batch time (on-chip split),
     then pipelined per-frame time at queue depths 2/3/4/6, then the same
     at depth 4 with a 1-scalar device-side sink replacing the full
     detection copy-out (bounds the d2h contribution).

Run on the TPU (single process!); numbers print incrementally.
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

    def build(quant_scatter):
        cfg = Config.fromfile(cfg_path)
        enable_backbone_quant(cfg.model)
        cfg.model["reader"]["quant_scatter"] = quant_scatter
        return build_model_from_cfg(cfg), cfg

    model_on, cfg = build(True)
    model_off, _ = build(False)
    test_cfg = model_on.processed_test_cfg()

    clouds = []
    for seed in range(4):
        p, m = _synth_points_realistic(
            1, cfg.data["max_points"], cfg.point_cloud_range, seed=seed)
        clouds.append((jnp.asarray(p), jnp.asarray(m)))

    variables = jax.jit(model_on.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *clouds[0], train=False
    )
    base = {k: v for k, v in variables.items() if k != "quant"}
    t0 = time.perf_counter()
    vq = calibrate(model_on, base, clouds[:2])
    print(f"[calibrate] {time.perf_counter() - t0:.1f}s", flush=True)

    def mk(model):
        @jax.jit
        def fn(v, p, m):
            preds = model.apply(v, p, m, train=False)
            return model.predict({}, preds, test_cfg)
        return fn

    fn_on, fn_off = mk(model_on), mk(model_off)

    # --- dispatch floor --------------------------------------------------
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

    # --- A: payload A/B ---------------------------------------------------
    for name, fn in (("payload_on", fn_on), ("payload_off", fn_off)):
        t0 = time.perf_counter()
        o = fn(vq, *clouds[0])
        np.asarray(o["scores"])
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    o_on = fn_on(vq, *clouds[1])
    o_off = fn_off(vq, *clouds[1])
    s_on, s_off = np.asarray(o_on["scores"]), np.asarray(o_off["scores"])
    d = float(np.max(np.abs(s_on - s_off)))
    print(f"[equality] max |score delta| on/off = {d:.3e} "
          f"(int8 round trip is value-exact => expect tiny)", flush=True)

    res = {"payload_on": [], "payload_off": []}
    for rnd in range(3):
        floor = floor_now()
        line = [f"[A round {rnd}] floor {floor * 1000:.2f}"]
        for name, fn in (("payload_on", fn_on), ("payload_off", fn_off)):
            ts = []
            for i in range(8):
                p, m = clouds[i % 4]
                t0 = time.perf_counter()
                np.asarray(fn(vq, p, m)["scores"])
                ts.append(time.perf_counter() - t0)
            t = (float(np.median(ts)) - floor) * 1000
            res[name].append(t)
            line.append(f"{name} {t:.2f}")
        print(" | ".join(line) + " ms on-chip", flush=True)
    med_on = float(np.median(res["payload_on"]))
    med_off = float(np.median(res["payload_off"]))
    print(f"[A split] int8 scatter payload on {med_on:.2f} vs off "
          f"{med_off:.2f} ms on-chip (delta {med_off - med_on:+.2f})",
          flush=True)

    # --- B: bs=8 steady state ----------------------------------------------
    reps = 2
    p8 = jnp.concatenate([p for p, _ in clouds] * reps, axis=0)
    m8 = jnp.concatenate([m for _, m in clouds] * reps, axis=0)
    t0 = time.perf_counter()
    o8 = fn_on(vq, p8, m8)
    np.asarray(o8["scores"])
    print(f"[compile] bs8: {time.perf_counter() - t0:.1f}s", flush=True)

    # device-side sink: bound the full-detection copy-out contribution
    @jax.jit
    def fn8_sink(v, p, m):
        preds = model_on.apply(v, p, m, train=False)
        det = model_on.predict({}, preds, test_cfg)
        return det["scores"].astype(jnp.float32).sum()

    t0 = time.perf_counter()
    float(np.asarray(fn8_sink(vq, p8, m8)))
    print(f"[compile] bs8_sink: {time.perf_counter() - t0:.1f}s", flush=True)

    out_bytes = sum(
        np.asarray(v).nbytes for v in jax.tree.leaves(o8)
    )
    print(f"[copyout] detection payload {out_bytes / 1e6:.2f} MB/batch",
          flush=True)

    def pipelined(fn, depth, n_batches=12, sink=False):
        # warm queue
        outs = []
        t0 = time.perf_counter()
        for _ in range(n_batches):
            outs.append(fn(vq, p8, m8))
            if len(outs) > depth - 1:
                o = outs.pop(0)
                _ = (float(np.asarray(o)) if sink
                     else np.asarray(o["scores"]))
        for o in outs:
            _ = float(np.asarray(o)) if sink else np.asarray(o["scores"])
        return (time.perf_counter() - t0) / (n_batches * 8) * 1000

    for rnd in range(3):
        floor = floor_now()
        # serial per-batch (hard sync per batch)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(fn_on(vq, p8, m8)["scores"])
            ts.append(time.perf_counter() - t0)
        ser = float(np.median(ts)) * 1000
        onchip = ser - floor * 1000
        line = [f"[B round {rnd}] floor {floor * 1000:.1f}",
                f"serial/batch {ser:.1f} (on-chip {onchip:.1f} = "
                f"{onchip / 8:.2f}/frame)"]
        for depth in (2, 3, 4, 6):
            line.append(f"d{depth} {pipelined(fn_on, depth):.2f}/frame")
        line.append(f"d4_sink {pipelined(fn8_sink, 4, sink=True):.2f}/frame")
        print(" | ".join(line) + " ms", flush=True)


if __name__ == "__main__":
    main()
