"""Train-step phase profiler: forward / backward / optimizer split.

Times three jitted graphs on the flagship config (judge item r2-#4):
  fwd       — forward + loss only
  fwd+bwd   — value_and_grad (no optimizer)
  full step — make_train_step (grads + clip + AdamW + BN-stat update)
Differences give the backward and optimizer shares. Reference phase-timing
analog: hook callsites in `torchie/trainer/trainer.py:358-436`.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_batch(cfg, B, rng):
    import jax.numpy as jnp

    from __graft_entry__ import _synth_points_realistic

    N = cfg.data["max_points"]
    pts, mask = _synth_points_realistic(B, N, cfg.point_cloud_range)
    grid = int(round(
        (cfg.point_cloud_range[3] - cfg.point_cloud_range[0])
        / cfg.pillar_size
    ))
    M = cfg.train_cfg["assigner"]["max_objs"]
    batch = {"points": jnp.asarray(pts), "points_mask": jnp.asarray(mask),
             "hm": [], "ind": [], "mask": [], "cat": [], "anno_box": [],
             "gt_box": []}
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
    batch["gt_boxes_and_cls"] = jnp.asarray(np.zeros((B, M, 10), np.float32))
    return batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", default="configs/pillarnet/pillarnet34_nusc_bf16.py"
    )
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from pillarnet_lts_tpu.apis import build_model_from_cfg
    from pillarnet_lts_tpu.parallel.train_state import TrainState
    from pillarnet_lts_tpu.parallel.train_step import make_train_step
    from pillarnet_lts_tpu.solver import build_optimizer
    from pillarnet_lts_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    model = build_model_from_cfg(cfg)
    rng = np.random.RandomState(0)
    batch = build_batch(cfg, args.batch, rng)
    train_cfg = dict(cfg.train_cfg)

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["points"], batch["points_mask"],
        train=False,
    )
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, 1000, 35.0)
    state = TrainState.create(variables, tx)

    def loss_only(params, batch_stats, b):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            b["points"], b["points_mask"],
            gt_boxes_and_cls=b.get("gt_boxes_and_cls"),
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1),
                  "sampler": jax.random.PRNGKey(2)},
        )
        losses = model.loss(b, out, train_cfg)
        total = jnp.asarray(0.0, jnp.float32)
        for l in losses["loss"]:
            total = total + l
        return total, mut["batch_stats"]

    def timeit(name, fn, *fargs):
        t0 = time.perf_counter()
        out = fn(*fargs)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        print(f"[compile+first] {name}: {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*fargs)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"[steady] {name}: {np.min(ts)*1000:.1f} ms", flush=True)
        return np.min(ts)

    fwd = jax.jit(lambda p, bs, b: loss_only(p, bs, b)[0])
    t_f = timeit("forward+loss", fwd, state.params, state.batch_stats, batch)

    def _fwd_bwd(p, bs, b):
        (l, _), grads = jax.value_and_grad(loss_only, has_aux=True)(p, bs, b)
        # reduce over every grad leaf so XLA cannot dead-code-eliminate the
        # backward (returning only the loss measures the forward again)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return l + 0.0 * gsum

    grad_fn = jax.jit(_fwd_bwd)
    t_fb = timeit("forward+loss+grads", grad_fn, state.params,
                  state.batch_stats, batch)

    step = jax.jit(
        make_train_step(model, tx, train_cfg), donate_argnums=(0,)
    )
    def full(s, b):
        s2, m = step(s, b)
        return s2, m["loss"]
    # non-donated timing copy each iter would skew; donate needs fresh state
    t0 = time.perf_counter()
    state2, l = full(state, batch)
    float(np.asarray(l))
    print(f"[compile+first] full step: {time.perf_counter()-t0:.1f}s",
          flush=True)
    ts = []
    cur = state2
    for _ in range(args.iters):
        t0 = time.perf_counter()
        cur, l = full(cur, batch)
        float(np.asarray(l))
        ts.append(time.perf_counter() - t0)
    t_full = np.min(ts)
    print(f"[steady] full step: {t_full*1000:.1f} ms", flush=True)
    print(f"[split] fwd {t_f*1000:.1f} | bwd {(t_fb-t_f)*1000:.1f} | "
          f"opt+stats {(t_full-t_fb)*1000:.1f} (each incl. ~28 ms dispatch "
          f"floor once)", flush=True)


if __name__ == "__main__":
    main()
