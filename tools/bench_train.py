"""Training-step throughput benchmark (single chip).

Measures the full jitted DP train step (forward + loss + grads + AdamW +
BN-stat update) for the flagship config on synthetic batches.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", default="configs/pillarnet/pillarnet34_nusc_bf16.py"
    )
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument(
        "--remat", action="store_true",
        help="force backbone remat=True (needed for bs>=2 on a 16 GB chip)",
    )
    parser.add_argument(
        "--remat-policy", default=None, choices=[None, "conv_out"],
        help="override backbone remat_policy (implies --remat; 'conv_out' "
             "keeps conv results, replays the elementwise tail)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_points
    from pillarnet_lts_tpu.apis import build_model_from_cfg
    from pillarnet_lts_tpu.parallel.train_state import TrainState
    from pillarnet_lts_tpu.parallel.train_step import make_train_step
    from pillarnet_lts_tpu.solver import build_optimizer
    from pillarnet_lts_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    if args.remat or args.remat_policy:
        cfg.model["backbone"]["remat"] = True
    if args.remat_policy:
        cfg.model["backbone"]["remat_policy"] = args.remat_policy
    model = build_model_from_cfg(cfg)
    B = args.batch
    N = cfg.data["max_points"]
    pts, mask = _synth_points(B, N, cfg.point_cloud_range)

    # synthetic targets at the task grids
    rng = np.random.RandomState(0)
    grid = int(round(
        (cfg.point_cloud_range[3] - cfg.point_cloud_range[0])
        / cfg.pillar_size
    ))
    M = cfg.train_cfg["assigner"]["max_objs"]
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.asarray(mask),
        "hm": [], "ind": [], "mask": [], "cat": [], "anno_box": [],
        "gt_box": [],
    }
    for t in cfg.tasks:
        s = int(t["stride"])
        H = W = grid // s
        ncls = len(t["class_names"])
        batch["hm"].append(jnp.asarray(
            rng.rand(B, H, W, ncls).astype(np.float32) * 0.3))
        batch["ind"].append(jnp.asarray(rng.randint(0, H * W, (B, M))))
        m = np.zeros((B, M), np.uint8)
        m[:, :40] = 1
        batch["mask"].append(jnp.asarray(m))
        batch["cat"].append(jnp.asarray(rng.randint(0, ncls, (B, M))))
        batch["anno_box"].append(jnp.asarray(
            rng.randn(B, M, 10).astype(np.float32)))
        gt = np.zeros((B, M, 7), np.float32)
        gt[..., :2] = rng.uniform(-50, 50, (B, M, 2))
        gt[..., 3:6] = rng.uniform(1, 4, (B, M, 3))
        batch["gt_box"].append(jnp.asarray(gt))
    batch["gt_boxes_and_cls"] = jnp.asarray(
        np.zeros((B, M, 10), np.float32))

    variables = model.init(
        jax.random.PRNGKey(0), batch["points"], batch["points_mask"],
        train=False,
    )
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, 1000, 35.0)
    state = TrainState.create(variables, tx)
    step = jax.jit(
        make_train_step(model, tx, dict(cfg.train_cfg)), donate_argnums=(0,)
    )

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss = float(np.asarray(metrics["loss"]))
    print(f"[compile+first] {time.perf_counter() - t0:.1f}s loss={loss:.2f}",
          flush=True)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        float(np.asarray(metrics["loss"]))
        times.append(time.perf_counter() - t0)
    per = float(np.mean(times))
    print(f"train step (bs={B}): {per * 1000:.1f} ms "
          f"({B / per:.2f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
