"""Benchmark: PillarNet-34 nuScenes-scale inference FPS (bs=1) on one chip.

Mirrors the reference latency harness `tools/dist_test.py --speed_test`
(batch 1, steady-state middle-third timing with device sync per frame,
`tools/dist_test.py:146-157,189`). Synthetic point clouds at nuScenes
10-sweep scale (262144-point static bucket, ~95% valid) run the full
pipeline: voxelize + PFE + sparse-semantics backbone + neck + CenterHead
decode + rotated NMS, all on device. Each timed frame ends with a host
copy-out of the score tensor, so the measurement includes a full
device-to-host synchronization (block_until_ready alone under-reports on
this PJRT backend).

Headline: bfloat16 compute (fp32 params, BN statistics and box decode —
the production inference configuration, `configs/pillarnet/
pillarnet34_nusc_bf16.py`); the fp32 number is reported alongside.

Baseline: PillarNet paper reports PillarNet-34 real-time (~20 FPS class) on
an RTX-3080-class GPU (BASELINE.md); vs_baseline = fps / 20.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 20.0


def _measure(config_path, n_frames=20):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_points
    from pillarnet_lts_tpu.apis import build_model_from_cfg
    from pillarnet_lts_tpu.utils.config import Config

    cfg = Config.fromfile(config_path)
    model = build_model_from_cfg(cfg)
    test_cfg = model.processed_test_cfg()

    clouds = []
    for seed in range(4):
        p, m = _synth_points(1, cfg.data["max_points"], cfg.point_cloud_range,
                             seed=seed)
        clouds.append((jnp.asarray(p), jnp.asarray(m)))

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *clouds[0], train=False
    )

    @jax.jit
    def fn(v, points, points_mask):
        preds = model.apply(v, points, points_mask, train=False)
        return model.predict({}, preds, test_cfg)

    out = fn(variables, *clouds[0])
    np.asarray(out["scores"])  # compile + warmup with hard sync

    times = []
    for i in range(n_frames):
        p, m = clouds[i % len(clouds)]
        t0 = time.perf_counter()
        out = fn(variables, p, m)
        _ = np.asarray(out["scores"])  # host copy-out = hard sync
        times.append(time.perf_counter() - t0)

    times = sorted(times)
    mid = times[len(times) // 3 : 2 * len(times) // 3]
    return float(np.mean(mid))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    root = os.path.dirname(os.path.abspath(__file__))
    bf16_t = _measure(
        os.path.join(root, "configs/pillarnet/pillarnet34_nusc_bf16.py")
    )

    record = {
        "metric": "pillarnet34_nusc_fps_bs1",
        "value": round(1.0 / bf16_t, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(1.0 / bf16_t / BASELINE_FPS, 3),
        "p50_latency_ms": round(bf16_t * 1000, 2),
    }

    # secondary fp32 measurement only with --full (another long remote
    # compile; the headline must not risk a harness timeout)
    if "--full" in sys.argv:
        try:
            fp32_t = _measure(
                os.path.join(root, "configs/pillarnet/pillarnet34_nusc.py")
            )
            record["fp32_fps"] = round(1.0 / fp32_t, 3)
            record["fp32_p50_latency_ms"] = round(fp32_t * 1000, 2)
        except Exception as e:
            record["fp32_error"] = str(e)[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
