"""Pallas pairwise suppression kernel vs the jnp IoU path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from pillarnet_lts_tpu.ops.iou3d import rotated_iou_bev, to_pcdet_bev
from pillarnet_lts_tpu.ops.pallas.nms_kernel import suppression_matrix_pallas
from pillarnet_lts_tpu.ops import nms as nms_ops


def _random_boxes(n, seed):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-12, 12, (n, 2))
    boxes[:, 3:5] = rng.uniform(1, 4, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


@pytest.mark.parametrize("seed", [0, 3])
def test_suppression_matrix_matches_jnp(seed):
    n = 96  # non-multiple of tile exercises padding
    boxes = _random_boxes(n, seed)
    thresh = 0.2

    bev = to_pcdet_bev(jnp.asarray(boxes))
    iou = np.asarray(rotated_iou_bev(bev, bev))
    idx = np.arange(n)
    want = ((idx[:, None] < idx[None, :]) & (iou > thresh)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            suppression_matrix_pallas(jnp.asarray(boxes), thresh)
        )
    # tolerance: borderline IoU==thresh pairs may flip under fp reassociation
    diff = np.abs(got - want)
    mismatch = diff > 0
    if mismatch.any():
        # every mismatch must be a near-threshold pair
        assert np.all(np.abs(iou[mismatch] - thresh) < 1e-3)


def test_rotated_nms_pallas_path_equals_jnp_path():
    n = 64
    boxes = jnp.asarray(_random_boxes(n, 7))
    scores = jnp.asarray(np.linspace(1, 0, n, dtype=np.float32))
    valid = jnp.ones(n, bool)

    sel_j, mask_j = nms_ops.rotated_nms(
        boxes, scores, valid, 0.2, 16, use_pallas=False
    )
    with pltpu.force_tpu_interpret_mode():
        sel_p, mask_p = nms_ops.rotated_nms(
            boxes, scores, valid, 0.2, 16, use_pallas=True
        )
    np.testing.assert_array_equal(np.asarray(mask_j), np.asarray(mask_p))
    np.testing.assert_array_equal(
        np.asarray(sel_j)[np.asarray(mask_j)],
        np.asarray(sel_p)[np.asarray(mask_p)],
    )
