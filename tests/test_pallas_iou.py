"""Pallas pairwise-overlap kernel vs the jnp Green-clip path (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from pillarnet_lts_tpu.ops.iou3d import (
    _convex_intersection_area,
    box_corners_bev,
)
from pillarnet_lts_tpu.ops.pallas.iou_kernel import (
    convex_intersection_area_pallas,
)


def _boxes(n, seed):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, 5), np.float32)
    b[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    b[:, 2:4] = rng.uniform(0.5, 6, (n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return jnp.asarray(b)


@pytest.mark.slow
def test_pallas_overlap_matches_jnp():
    a = _boxes(24, 0)
    b = _boxes(136, 1)
    ca = box_corners_bev(a)
    cb = box_corners_bev(b)

    pair_a, pair_b = jnp.broadcast_arrays(ca[:, None], cb[None, :])
    want = _convex_intersection_area(pair_a, pair_b)
    with pltpu.force_tpu_interpret_mode():
        got = convex_intersection_area_pallas(ca, cb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.slow
def test_pallas_overlap_identical_and_touching():
    # identical boxes, shared-edge boxes: the boundary-collinear cases the
    # enlargement regularizes
    b = np.array(
        [
            [0.0, 0.0, 2.0, 4.0, 0.3],
            [0.0, 0.0, 2.0, 4.0, 0.3],
            [2.0, 0.0, 2.0, 4.0, 0.0],
            [0.0, 0.0, 2.0, 4.0, 0.0],
        ],
        np.float32,
    )
    boxes = jnp.asarray(np.tile(b, (4, 1)))  # 16 rows
    c = box_corners_bev(boxes)
    pair_a, pair_b = jnp.broadcast_arrays(c[:, None], c[None, :])
    want = _convex_intersection_area(pair_a, pair_b)
    with pltpu.force_tpu_interpret_mode():
        got = convex_intersection_area_pallas(c, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.slow
def test_pallas_overlap_under_vmap():
    # the grouped multi-task NMS vmaps the pairwise overlap over tasks
    tasks_a = jnp.stack([box_corners_bev(_boxes(16, s)) for s in (2, 3)])
    tasks_b = jnp.stack([box_corners_bev(_boxes(130, s)) for s in (4, 5)])

    def one(ca, cb):
        return convex_intersection_area_pallas(ca, cb)

    with pltpu.force_tpu_interpret_mode():
        got = jax.vmap(one)(tasks_a, tasks_b)

    for t in range(2):
        pair_a, pair_b = jnp.broadcast_arrays(
            tasks_a[t][:, None], tasks_b[t][None, :]
        )
        want = _convex_intersection_area(pair_a, pair_b)
        np.testing.assert_allclose(
            np.asarray(got[t]), np.asarray(want), atol=1e-4, err_msg=f"t{t}"
        )
