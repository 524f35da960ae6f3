"""ServingPipeline (runtime/serving.py): order preservation, bounded
in-flight depth, drain semantics — the latency-hiding serving shape used by
the pipelined eval loop in tools/dist_test.py."""

import numpy as np

import jax
import jax.numpy as jnp

from pillarnet_lts_tpu.runtime.serving import ServingPipeline


def test_order_and_results():
    fn = jax.jit(lambda x: x * 2 + 1)
    pipe = ServingPipeline(fn, depth=3)
    outs = list(pipe.map((jnp.full((4,), i, jnp.float32),)
                         for i in range(17)))
    assert len(outs) == 17
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(np.asarray(o), np.full((4,), 2 * i + 1,
                                                             np.float32))


def test_depth_bound_and_drain():
    fn = jax.jit(lambda x: x + 1)
    pipe = ServingPipeline(fn, depth=2)
    got = []
    for i in range(5):
        r = pipe.submit(jnp.float32(i))
        assert len(pipe) <= 2
        if r is not None:
            got.append(float(r))
    got.extend(float(r) for r in pipe.drain())
    assert got == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert len(pipe) == 0


def test_pytree_results():
    fn = jax.jit(lambda x: {"a": x.sum(), "b": x * 0})
    pipe = ServingPipeline(fn, depth=1)
    outs = list(pipe.map((jnp.ones((3,)) * i,) for i in range(4)))
    assert [float(o["a"]) for o in outs] == [0.0, 3.0, 6.0, 9.0]
    assert all(isinstance(o["b"], np.ndarray) for o in outs)
