"""Precise-BN recalibration: swap exact batch statistics into a TrainState.

BatchNorm running averages converge to the true activation statistics only
after ~1/momentum steps (momentum 0.01 here, matching the reference's
``build_norm_layer`` defaults, `det3d/models/utils/norm.py`). Short runs —
fine-tuning, overfit tests, small schedules — evaluate with badly lagged
stats, which is a pure artifact of the running-average estimator. The
standard remedy (precise BN / "BN recalibration") recomputes the statistics
from data with the trained weights frozen.

The exact per-batch statistics are recovered without touching module
internals: one train-mode pass updates each stat as

    R' = (1 - m) * R + m * B

with B the batch statistic and m the (per-module, unknown here) momentum.
Two consecutive passes over the *same* batch with the *same* rngs give two
points of this affine fixed-point iteration, from which B is extrapolated
elementwise:

    B = R0 + (R1 - R0)^2 / ((R1 - R0) - (R2 - R1))

exactly, for any per-module momentum. Across multiple batches the
extrapolated stats are averaged (the usual precise-BN approximation: means
of means and means of variances, ignoring the between-batch mean spread).
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def _extrapolate(r0, r1, r2):
    d1 = r1 - r0
    d2 = r2 - r1
    denom = d1 - d2
    safe = jnp.abs(denom) > 1e-12
    frac = jnp.where(safe, d1 * d1 / jnp.where(safe, denom, 1.0), 0.0)
    # where the iteration did not move (stat frozen or already exact) keep R1
    return jnp.where(safe, r0 + frac, r1)


def batch_stats_for(model, params, batch_stats, batch, rng_seed=0):
    """Exact batch statistics of `batch` under `params` (one batch)."""
    rngs = {
        "dropout": jax.random.PRNGKey(rng_seed),
        "sampler": jax.random.PRNGKey(rng_seed + 1),
    }

    def one_pass(stats):
        _, mut = model.apply(
            {"params": params, "batch_stats": stats},
            batch["points"],
            batch["points_mask"],
            train=True,
            mutable=["batch_stats"],
            rngs=rngs,
        )
        return mut["batch_stats"]

    r1 = one_pass(batch_stats)
    r2 = one_pass(r1)
    return jtu.tree_map(_extrapolate, batch_stats, r1, r2)


def recompute_batch_stats(model, state, batches, rng_seed=0):
    """Return `state` with batch_stats replaced by precise statistics.

    batches: iterable of device batches with 'points'/'points_mask'.
    Multiple batches are averaged leaf-wise (precise-BN approximation).
    """
    acc = None
    n = 0
    for batch in batches:
        stats = batch_stats_for(
            model, state.params, state.batch_stats, batch, rng_seed
        )
        acc = stats if acc is None else jtu.tree_map(jnp.add, acc, stats)
        n += 1
    if n == 0:
        return state
    avg = jtu.tree_map(lambda a: a / n, acc)
    return state.replace(batch_stats=avg)
