"""Solver schedules vs the reference OneCycle formulas."""

import numpy as np
import jax.numpy as jnp

from pillarnet_lts_tpu.solver.optim import (
    one_cycle_schedules, exponential_decay_schedule, manual_stepping_schedule,
    build_optimizer,
)


def _annealing_cos_np(start, end, pct):
    """Reference formula (`learning_schedules_fastai.py:70-74`)."""
    cos_out = np.cos(np.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def _reference_one_cycle(step, total, lr_max, moms, div, pct_start):
    """Scalar re-derivation of OneCycle.step (`:77-96` + `:53-67`)."""
    low_lr = lr_max / div
    a1 = int(total * pct_start)
    if step < a1:
        lr = _annealing_cos_np(low_lr, lr_max, step / a1)
        mom = _annealing_cos_np(moms[0], moms[1], step / a1)
    else:
        lr = _annealing_cos_np(lr_max, low_lr / 1e4, (step - a1) / (total - a1))
        mom = _annealing_cos_np(moms[1], moms[0], (step - a1) / (total - a1))
    return lr, mom


def test_one_cycle_matches_reference():
    total, lr_max, moms, div, pct = 1000, 1e-3, (0.95, 0.85), 10.0, 0.4
    lr_fn, mom_fn = one_cycle_schedules(total, lr_max, moms, div, pct)
    for step in [0, 1, 100, 399, 400, 401, 700, 999]:
        want_lr, want_mom = _reference_one_cycle(
            step, total, lr_max, moms, div, pct
        )
        np.testing.assert_allclose(float(lr_fn(step)), want_lr, rtol=1e-3)
        np.testing.assert_allclose(float(mom_fn(step)), want_mom, rtol=1e-4)


def test_exp_decay_staircase():
    fn = exponential_decay_schedule(100, 1e-3, 0.1, 0.8, staircase=True)
    np.testing.assert_allclose(float(fn(0)), 1e-3)
    np.testing.assert_allclose(float(fn(9)), 1e-3)
    np.testing.assert_allclose(float(fn(10)), 8e-4, rtol=1e-6)
    np.testing.assert_allclose(float(fn(25)), 1e-3 * 0.8 ** 2, rtol=1e-6)


def test_manual_stepping():
    fn = manual_stepping_schedule(100, [0.8, 0.9], [1e-3, 1e-4, 5e-5])
    np.testing.assert_allclose(float(fn(0)), 1e-3)
    np.testing.assert_allclose(float(fn(79)), 1e-3)
    np.testing.assert_allclose(float(fn(80)), 1e-4)
    np.testing.assert_allclose(float(fn(95)), 5e-5)


def test_frozen_prefix_zeroes_updates():
    import optax

    tx = build_optimizer(
        dict(type="adam", wd=0.01),
        dict(type="one_cycle", lr_max=1e-3, moms=[0.95, 0.85],
             div_factor=10.0, pct_start=0.4),
        total_steps=10,
        frozen_prefixes=("single_det",),
    )
    params = {
        "single_det": {"w": jnp.ones((3,))},
        "roi_head_net": {"w": jnp.ones((3,))},
    }
    grads = {
        "single_det": {"w": jnp.ones((3,))},
        "roi_head_net": {"w": jnp.ones((3,))},
    }
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["single_det"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["roi_head_net"]["w"]).sum()) > 0.0
