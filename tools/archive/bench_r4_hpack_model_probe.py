"""Round-4 on-chip probe: IN-MODEL A/B of the stage-2 H-pack.

The isolated probe (`bench_r4_hs2d_probe.py`) measured the 9-conv
64-channel chain at bf16 ~9.1 -> ~3.5 ms / int8 ~6.3 -> ~1.0 ms under
H-pack. Isolated wins have not always survived the whole-graph layout
context (ROADMAP round 4), so this compiles the FULL pillarnet34_nusc
eval graph with backbone.hpack off/on — bf16 and int8 — and interleaves
timing rounds in one session.
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
    refs = {}
    for tag, int8, hpack in (
        ("bf16_plain", False, False),
        ("bf16_hpack", False, True),
        ("int8_plain", True, False),
        ("int8_hpack", True, True),
    ):
        cfg = Config.fromfile(
            "configs/pillarnet/pillarnet34_nusc_int8.py" if int8
            else "configs/pillarnet/pillarnet34_nusc_bf16.py"
        )
        if int8:
            enable_backbone_quant(cfg.model)
        cfg.model["backbone"]["hpack"] = hpack
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
        if int8:
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
            print(f"[compile] {tag} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"[compile] {tag}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        base = tag.split("_")[0]
        if base not in refs:
            refs[base] = s
        else:
            d = float(np.max(np.abs(s - refs[base])))
            print(f"  {tag} max |scores - {base}_plain| = {d:.2e}",
                  flush=True)
        fns[tag] = (fn, variables)

    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.2f} ms"]
        for tag, (fn, variables) in fns.items():
            p, m = clouds[rnd % len(clouds)]
            fn(variables, p, m)  # warm
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                np.asarray(fn(variables, p, m)["scores"])
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            line.append(
                f"{tag} {med * 1000:.2f} "
                f"(chip {(med - floor) * 1000:.2f})"
            )
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
