"""Benchmark: PillarNet-34 nuScenes-scale inference FPS (bs=1) on one chip.

Mirrors the reference latency harness `tools/dist_test.py --speed_test`
(batch 1, steady-state middle-third timing with device sync per frame,
`tools/dist_test.py:146-157,189`). Synthetic point clouds at nuScenes
10-sweep scale (262144-point static bucket, ~95% valid) run the full
pipeline: voxelize + PFE + sparse-semantics backbone + neck + CenterHead
decode + rotated NMS, all on device.

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

    from __graft_entry__ import entry

    fn, (pts, mask) = entry()
    fn = jax.jit(fn)

    # warmup / compile
    out = fn(pts, mask)
    jax.block_until_ready(out)

    n_frames = 30
    times = []
    for i in range(n_frames):
        t0 = time.perf_counter()
        out = fn(pts, mask)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    # steady-state: middle third
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
