"""Round-4 on-chip probe: int8 pipelined serving vs batch size.

bs=8 (23.4 FPS, BENCH round 4) was the best per-chip number; bs=16 is
unmeasurable here (the remote compile helper dies on the 16-batch serving
graph). This probe fills the gap between them — compile each batch size
once, then interleave timing rounds so every comparison is same-session
(the relay floor drifts 24-41 ms across sessions, see docs/ROADMAP.md).

Usage: python tools/bench_r4_batch_probe.py [bs ...]   (default: 8 12)

Protocol per batch size mirrors bench.py's big-batch path: pipelined
dispatch with up to 3 batches momentarily outstanding (append, then drain
to depth 2), n_pipe batches per timing sample.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    batch_sizes = [int(a) for a in sys.argv[1:]] or [8, 12]

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

    cfg = Config.fromfile("configs/pillarnet/pillarnet34_nusc_int8.py")
    enable_backbone_quant(cfg.model)
    model = build_model_from_cfg(cfg)
    test_cfg = model.processed_test_cfg()

    clouds = []
    for seed in range(4):
        p, m = _synth_points_realistic(
            1, cfg.data["max_points"], cfg.point_cloud_range, seed=seed
        )
        clouds.append((jnp.asarray(p), jnp.asarray(m)))

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *clouds[0], train=False
    )
    variables = calibrate(
        model,
        {k: v for k, v in variables.items() if k != "quant"},
        clouds[:2],
    )
    jax.block_until_ready(variables)

    @jax.jit
    def fn(v, points, points_mask):
        preds = model.apply(v, points, points_mask, train=False)
        return model.predict({}, preds, test_cfg)

    inputs = {}
    for bs in batch_sizes:
        reps = -(-bs // len(clouds))
        pb = jnp.concatenate([p for p, _ in clouds] * reps, axis=0)[:bs]
        mb = jnp.concatenate([m for _, m in clouds] * reps, axis=0)[:bs]
        t0 = time.perf_counter()
        try:
            out = fn(variables, pb, mb)
            np.asarray(out["scores"])
        except Exception as e:
            print(f"[compile] bs={bs} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"[compile] bs={bs}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        inputs[bs] = (pb, mb)

    n_pipe = 10
    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.2f} ms"]
        for bs, (pb, mb) in inputs.items():
            fn(variables, pb, mb)  # warm the queue
            t0 = time.perf_counter()
            outs = []
            for _ in range(n_pipe):
                outs.append(fn(variables, pb, mb))
                if len(outs) > 2:
                    np.asarray(outs.pop(0)["scores"])
            for o in outs:
                np.asarray(o["scores"])
            per_frame = (time.perf_counter() - t0) / (n_pipe * bs)
            line.append(
                f"bs{bs} {per_frame * 1000:.2f} ms/frame"
                f" = {1.0 / per_frame:.2f} FPS"
            )
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
