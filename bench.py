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


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry, _synth_points
    from pillarnet_lts_tpu.utils.config import Config

    fn, (variables, pts, mask) = entry()
    fn = jax.jit(fn)

    # a few distinct input clouds so no result caching can kick in
    cfg = Config.fromfile(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs", "pillarnet", "pillarnet34_nusc.py")
    )
    clouds = []
    for seed in range(4):
        p, m = _synth_points(1, cfg.data["max_points"], cfg.point_cloud_range,
                             seed=seed)
        clouds.append((jnp.asarray(p), jnp.asarray(m)))

    # warmup / compile
    out = fn(variables, *clouds[0])
    np.asarray(out["scores"])

    n_frames = 30
    times = []
    for i in range(n_frames):
        p, m = clouds[i % len(clouds)]
        t0 = time.perf_counter()
        out = fn(variables, p, m)
        _ = np.asarray(out["scores"])  # host copy-out = hard sync
        times.append(time.perf_counter() - t0)

    # steady-state: middle third (sorted), reference protocol analog
    times = sorted(times)
    mid = times[len(times) // 3 : 2 * len(times) // 3]
    per_frame = float(np.mean(mid))
    fps = 1.0 / per_frame

    print(
        json.dumps(
            {
                "metric": "pillarnet34_nusc_fps_bs1",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "p50_latency_ms": round(per_frame * 1000, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
