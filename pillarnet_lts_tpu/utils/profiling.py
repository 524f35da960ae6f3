"""Profiling / introspection utilities.

TPU-native equivalents of the reference's instrumentation:
- `flops_counter.py` hook-based MAC counting -> XLA's own cost analysis via
  `jit(...).lower().compile().cost_analysis()`.
- `get_model_params` (`torchie/apis/env.py:95`) -> pytree leaf sum.
- phase timing hooks -> `jax.profiler` trace context (xprof-compatible).
"""

import contextlib

import jax
import numpy as np


def count_params(params):
    """Total parameter count of a pytree (reference `env.py:95-107`)."""
    return int(
        sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    )


def cost_analysis(fn, *example_args, **kwargs):
    """Compile `fn` and return XLA's cost analysis dict (flops, bytes
    accessed...) — the `flops_counter.py` equivalent, exact rather than
    hook-estimated."""
    lowered = jax.jit(fn, **kwargs).lower(*example_args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    return costs


@contextlib.contextmanager
def trace(log_dir="/tmp/jax-trace"):
    """Capture an xprof trace of the enclosed block
    (view with tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
