"""Phase 6: REAL-model reader phase under both scatter dedup modes, one
session — decides whether the bf16 profile's reader regression (round-3
~17 -> ~38 ms on-chip) is a true in-model effect of the round-4 scatter
change or remote-compile layout variance."""

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
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk
    from pillarnet_lts_tpu.utils.config import Config

    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros(())
    float(np.asarray(tiny(z)))

    def floor_now():
        fs = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(np.asarray(tiny(z)))
            fs.append(time.perf_counter() - t0)
        return float(np.median(fs))

    cfg = Config.fromfile("configs/pillarnet/pillarnet34_nusc_bf16.py")
    model = build_model_from_cfg(cfg)
    pts, mask = _synth_points_realistic(
        1, cfg.data["max_points"], cfg.point_cloud_range
    )
    pts, mask = jnp.asarray(pts), jnp.asarray(mask)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), pts, mask, train=False
    )
    jax.block_until_ready(variables)

    fns = {}
    for mode in ("kernel", "xla", "xla2"):
        vk.set_mxu_dedup("xla" if mode == "xla2" else mode)

        @jax.jit
        def reader_fn(v, p, m):
            g, o = model.apply(
                v, p, m, False,
                method=lambda mdl, p_, m_, tr: mdl.reader_net(p_, m_, tr),
            )
            return g.sum() + o.sum()

        t0 = time.perf_counter()
        s = float(np.asarray(reader_fn(variables, pts, mask)))
        print(f"[compile] reader dedup={mode}: "
              f"{time.perf_counter() - t0:.1f}s (checksum {s:.3e})",
              flush=True)
        fns[mode] = reader_fn
    vk.set_mxu_dedup("xla")

    for rnd in range(3):
        floor = floor_now()
        line = [f"[round {rnd}] floor {floor * 1000:.2f}"]
        for mode, fn in fns.items():
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                float(np.asarray(fn(variables, pts, mask)))
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
            line.append(f"{mode}: {t * 1000:.2f} raw "
                        f"{(t - floor) * 1000:.2f} chip")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
