"""RoI-aware voxel pooling vs an independent numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from pillarnet_lts_tpu.ops.roiaware_pool import (
    points_in_boxes_batch,
    points_in_boxes_index,
    roiaware_pool3d,
)

MARGIN = 1e-5


def _oracle_assign(points, rois, out):
    """Reference semantics re-derived from roiaware_pool3d_kernel.cu."""
    ox, oy, oz = out
    n = rois.shape[0]
    vox_of = -np.ones((points.shape[0], n), np.int64)
    for bi, roi in enumerate(rois):
        cx, cy, cz, w, l, h, yaw = roi
        dx, dy, dz, rz = l, w, h, -yaw - np.pi / 2  # to_pcdet
        ca, sa = np.cos(-rz), np.sin(-rz)
        for pi, pt in enumerate(points):
            x, y, z = pt[:3]
            if abs(z - cz) > dz / 2:
                continue
            lx = (x - cx) * ca - (y - cy) * sa
            ly = (x - cx) * sa + (y - cy) * ca
            if abs(lx) >= dx / 2 + MARGIN or abs(ly) >= dy / 2 + MARGIN:
                continue
            xi = min(max(int((lx + dx / 2) / (dx / ox)), 0), ox - 1)
            yi = min(max(int((ly + dy / 2) / (dy / oy)), 0), oy - 1)
            zi = min(max(int((z - cz + dz / 2) / (dz / oz)), 0), oz - 1)
            vox_of[pi, bi] = (xi * oy + yi) * oz + zi
    return vox_of


def _data(seed, p=400, n=5):
    rng = np.random.RandomState(seed)
    points = rng.uniform(-10, 10, (p, 3)).astype(np.float32)
    rois = np.zeros((n, 7), np.float32)
    rois[:, 0:3] = rng.uniform(-6, 6, (n, 3))
    rois[:, 3:6] = rng.uniform(2, 6, (n, 3))
    rois[:, 6] = rng.uniform(-np.pi, np.pi, n)
    feats = rng.randn(p, 4).astype(np.float32)
    return points, rois, feats


import pytest


@pytest.mark.parametrize("n", [5, 40])  # 40 exercises the RoI-chunked path
def test_pool_max_and_avg_match_oracle(n):
    out = (4, 4, 2)
    points, rois, feats = _data(0, n=n)
    vox_of = _oracle_assign(points, rois, out)

    got_max = np.asarray(
        roiaware_pool3d(jnp.asarray(rois), jnp.asarray(points),
                        jnp.asarray(feats), out, pool="max")
    )
    got_avg = np.asarray(
        roiaware_pool3d(jnp.asarray(rois), jnp.asarray(points),
                        jnp.asarray(feats), out, pool="avg")
    )

    n = rois.shape[0]
    nvox = out[0] * out[1] * out[2]
    want_max = np.zeros((n, nvox, 4), np.float32)
    want_avg = np.zeros((n, nvox, 4), np.float32)
    touched = 0
    for bi in range(n):
        for v in range(nvox):
            sel = feats[vox_of[:, bi] == v]
            if len(sel):
                want_max[bi, v] = sel.max(axis=0)
                want_avg[bi, v] = sel.mean(axis=0)
                touched += 1
    assert touched > 10  # the fixture actually exercises pooling
    np.testing.assert_allclose(
        got_max.reshape(n, nvox, 4), want_max, atol=1e-5)
    np.testing.assert_allclose(
        got_avg.reshape(n, nvox, 4), want_avg, atol=1e-5)


def test_points_in_boxes_index_matches_oracle():
    points, rois, _ = _data(1)
    vox_of = _oracle_assign(points, rois, (1, 1, 1))
    want = np.where(
        (vox_of >= 0).any(axis=1), np.argmax(vox_of >= 0, axis=1), -1
    )
    got = np.asarray(
        points_in_boxes_index(jnp.asarray(points), jnp.asarray(rois)))
    np.testing.assert_array_equal(got, want)
    assert (got >= 0).sum() > 10

    got_b = np.asarray(points_in_boxes_batch(
        jnp.asarray(points)[None], jnp.asarray(rois)[None]))
    np.testing.assert_array_equal(got_b[0], want)


def test_pool_gradients_flow_to_contributing_points():
    out = (2, 2, 2)
    points, rois, feats = _data(2, p=120, n=3)

    def loss(f, pool):
        return roiaware_pool3d(
            jnp.asarray(rois), jnp.asarray(points), f, out, pool=pool
        ).sum()

    for pool in ("max", "avg"):
        g = np.asarray(jax.grad(lambda f: loss(f, pool))(jnp.asarray(feats)))
        assert np.isfinite(g).all()
        inside = _oracle_assign(points, rois, out).max(axis=1) >= 0
        # background points never receive gradient
        assert np.abs(g[~inside]).max() == 0.0
        assert np.abs(g[inside]).sum() > 0.0
