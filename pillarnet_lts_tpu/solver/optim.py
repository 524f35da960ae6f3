"""Optimizer + LR/momentum schedules.

Replicates the reference solver exactly (`det3d/solver/`):

- OneCycle (`learning_schedules_fastai.py:77-96`): two cosine phases —
  lr:  lr_max/div_factor -> lr_max over pct_start, then lr_max -> lr_max/1e4/
  div_factor... precisely `low_lr / 1e4` where low_lr = lr_max/div_factor;
  mom: moms[0] -> moms[1], then moms[1] -> moms[0].
- Optimizer: Adam with *true* (decoupled) weight decay (`fastai_optim.py:121`
  OptimWrapper true_wd, config `wd=0.01, fixed_wd=True`) == AdamW; the
  one-cycle momentum drives Adam's beta1 (fastai maps mom -> betas[0]).
- Gradient clipping by global norm (`torchie/trainer/hooks/optimizer.py:15-21`
  with optimizer_config.grad_clip max_norm).

Implemented as optax transforms; schedules are jit-friendly closures over the
global step, mirroring `LRSchedulerStep.step` called once per iteration
(`trainer.py:406-407`).
"""

import jax.numpy as jnp
import optax


def _annealing_cos(start, end, pct):
    """Cosine anneal from start to end as pct goes 0 -> 1
    (`learning_schedules_fastai.py:70-74`)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_schedules(total_steps, lr_max, moms, div_factor, pct_start):
    """Returns (lr_schedule, mom_schedule) callables of the global step."""
    low_lr = lr_max / div_factor
    final_lr = low_lr / 1e4
    a1 = int(total_steps * pct_start)
    a1 = max(a1, 1)
    span2 = max(total_steps - a1, 1)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        pct1 = jnp.clip(step / a1, 0.0, 1.0)
        pct2 = jnp.clip((step - a1) / span2, 0.0, 1.0)
        up = _annealing_cos(low_lr, lr_max, pct1)
        down = _annealing_cos(lr_max, final_lr, pct2)
        return jnp.where(step < a1, up, down)

    def mom_fn(step):
        step = jnp.asarray(step, jnp.float32)
        pct1 = jnp.clip(step / a1, 0.0, 1.0)
        pct2 = jnp.clip((step - a1) / span2, 0.0, 1.0)
        down = _annealing_cos(moms[0], moms[1], pct1)
        up = _annealing_cos(moms[1], moms[0], pct2)
        return jnp.where(step < a1, down, up)

    return lr_fn, mom_fn


def exponential_decay_schedule(total_steps, init_lr, decay_length,
                               decay_factor, staircase=True):
    """`ExponentialDecay` (`learning_schedules_fastai.py:98-129`);
    decay_length is a fraction of total_steps."""
    decay_steps = max(int(decay_length * total_steps), 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        p = step / decay_steps
        if staircase:
            p = jnp.floor(p)
        return init_lr * jnp.power(decay_factor, p)

    return fn


def manual_stepping_schedule(total_steps, boundaries, rates):
    """`ManualStepping` (`learning_schedules_fastai.py:132-141`);
    boundaries are fractions in (0, 1)."""
    assert len(boundaries) + 1 == len(rates)
    bounds = jnp.asarray([b * total_steps for b in boundaries])
    rates_arr = jnp.asarray(rates, jnp.float32)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        idx = (step >= bounds).sum()
        return rates_arr[idx]

    return fn


def build_optimizer(cfg, lr_config, total_steps, grad_clip_norm=None,
                    frozen_prefixes=()):
    """Build the training gradient transformation from reference-style config.

    cfg: e.g. dict(type='adam', amsgrad=0.0, wd=0.01, fixed_wd=True)
    lr_config: dict(type='one_cycle', lr_max=..., moms=[...], div_factor=...,
                    pct_start=...)
    frozen_prefixes: top-level param-tree keys to exclude from updates — the
    optimizer-side half of the reference's stage-1 freeze
    (`pillar_rcnn.py:20-23` + FrozenBatchNorm; forward-side stop_gradient
    lives in the detector).
    """
    opt_type = cfg.get("type", "adam").lower()
    if opt_type != "adam":
        raise NotImplementedError(f"optimizer type {opt_type}")
    wd = cfg.get("wd", 0.01)

    sched_type = lr_config.get("type")
    if sched_type == "one_cycle":
        lr_fn, mom_fn = one_cycle_schedules(
            total_steps,
            lr_config["lr_max"],
            tuple(lr_config["moms"]),
            lr_config["div_factor"],
            lr_config["pct_start"],
        )
    elif sched_type == "exp_decay":
        lr_fn = exponential_decay_schedule(
            total_steps,
            lr_config["init_lr"],
            lr_config["decay_length"],
            lr_config["decay_factor"],
            staircase=lr_config.get("staircase", True),
        )
        mom_fn = 0.9
    elif sched_type == "manual_stepping":
        lr_fn = manual_stepping_schedule(
            total_steps, list(lr_config["boundaries"]), list(lr_config["rates"])
        )
        mom_fn = 0.9
    else:
        raise NotImplementedError(f"lr schedule {sched_type}")

    opt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr_fn, b1=mom_fn, b2=0.99, weight_decay=wd
    )

    transforms = []
    if grad_clip_norm is not None:
        transforms.append(optax.clip_by_global_norm(grad_clip_norm))
    transforms.append(opt)
    tx = optax.chain(*transforms)

    if frozen_prefixes:
        frozen = set(frozen_prefixes)

        def label_tree(params):
            return {
                k: ("frozen" if k in frozen else "train") for k in params
            }

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_tree
        )
    return tx
