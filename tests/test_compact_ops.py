"""Compact (gather-based) sparse ops vs dense oracles (CPU, exact)."""

import numpy as np
import jax
import jax.numpy as jnp

from pillarnet_lts_tpu.ops.compact import (
    compact_segment_max,
    compact_to_dense,
    down_conv_neighbor_table,
    downsample_site_ids,
    gather_conv,
    lookup_ids,
    searchsorted_left,
    subm_neighbor_table,
)
from pillarnet_lts_tpu.ops.voxelize import scatter_max_to_grid
from pillarnet_lts_tpu.models.backbones.base import dilate_mask


def _random_scene(seed, H=24, W=20, N=400, C=6, occupancy=0.12):
    rng = np.random.RandomState(seed)
    n_sites = max(1, int(H * W * occupancy))
    sites = rng.choice(H * W, n_sites, replace=False)
    ids = sites[rng.randint(0, n_sites, N)].astype(np.int32)
    feats = rng.randn(N, C).astype(np.float32)
    valid = rng.rand(N) > 0.1
    ids = np.where(valid, ids, H * W).astype(np.int32)
    return feats, ids, valid


def test_searchsorted_matches_numpy():
    rng = np.random.RandomState(0)
    for n in (7, 64, 100, 257):
        table = np.sort(rng.randint(0, 500, n)).astype(np.int32)
        q = rng.randint(-5, 510, 333).astype(np.int32)
        got = np.asarray(searchsorted_left(jnp.array(table), jnp.array(q)))
        want = np.searchsorted(table, q, side="left")
        np.testing.assert_array_equal(got, want)


def test_compact_segment_max_matches_dense_scatter():
    H, W, C = 24, 20, 6
    for seed in range(3):
        feats, ids, valid = _random_scene(seed, H, W, C=C)
        grid, occ = scatter_max_to_grid(
            jnp.array(feats)[None], jnp.array(ids)[None],
            jnp.array(valid)[None], H, W,
        )
        rows, site_ids, k = compact_segment_max(
            jnp.array(feats), jnp.array(ids), jnp.array(valid), H * W, 128
        )
        k = int(k)
        assert k == int(np.asarray(occ).sum())
        site_ids_np = np.asarray(site_ids)
        # sorted row-major, padding = H*W
        assert (np.diff(site_ids_np[:k]) > 0).all()
        assert (site_ids_np[k:] == H * W).all()
        dense = np.asarray(grid)[0].reshape(-1, C)
        np.testing.assert_allclose(
            np.asarray(rows)[:k], dense[site_ids_np[:k]], atol=1e-6
        )
        # sentinel + padding rows are zero
        np.testing.assert_array_equal(np.asarray(rows)[k:], 0.0)

        # dense roundtrip
        g2, o2 = compact_to_dense(rows, site_ids, jnp.asarray(k), H, W)
        np.testing.assert_array_equal(np.asarray(o2), np.asarray(occ)[0])
        np.testing.assert_allclose(np.asarray(g2), np.asarray(grid)[0], atol=1e-6)


def test_gather_conv_matches_dense_subm_conv():
    """Compact SubM conv == dense conv + re-zero at active sites."""
    H, W, Cin, Cout = 24, 20, 6, 8
    rng = np.random.RandomState(3)
    kernel = rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.2
    bias = rng.randn(Cout).astype(np.float32)

    for seed in range(3):
        feats, ids, valid = _random_scene(seed, H, W, C=Cin)
        grid, occ = scatter_max_to_grid(
            jnp.array(feats)[None], jnp.array(ids)[None],
            jnp.array(valid)[None], H, W,
        )
        dense_y = jax.lax.conv_general_dilated(
            grid, jnp.array(kernel), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        rows, site_ids, k = compact_segment_max(
            jnp.array(feats), jnp.array(ids), jnp.array(valid), H * W, 128
        )
        nbr = subm_neighbor_table(site_ids, k, H, W, 128)
        y = gather_conv(rows, nbr, jnp.array(kernel).reshape(9 * Cin, Cout),
                        jnp.array(bias))
        kv = int(k)
        sid = np.asarray(site_ids)[:kv]
        want = np.asarray(dense_y)[0].reshape(-1, Cout)[sid]
        np.testing.assert_allclose(np.asarray(y)[:kv], want, atol=1e-4)


def test_downsample_site_ids_matches_dilate_mask():
    H, W = 24, 20
    for seed in range(4):
        feats, ids, valid = _random_scene(seed, H, W)
        _, occ = scatter_max_to_grid(
            jnp.array(feats)[None], jnp.array(ids)[None],
            jnp.array(valid)[None], H, W,
        )
        rows, site_ids, k = compact_segment_max(
            jnp.array(feats), jnp.array(ids), jnp.array(valid), H * W, 128
        )
        ids2, k2 = downsample_site_ids(site_ids, k, H, W, 256)
        want_mask = np.asarray(dilate_mask(occ, 2))[0]
        got = np.zeros_like(want_mask)
        k2 = int(k2)
        got.reshape(-1)[np.asarray(ids2)[:k2]] = True
        np.testing.assert_array_equal(got, want_mask)
        assert (np.asarray(ids2)[k2:] == (H // 2) * (W // 2)).all()


def test_down_conv_table_matches_dense_strided_conv():
    """Compact strided conv (gather at fine sites, matmul) == dense stride-2
    conv at the dilated output sites."""
    H, W, Cin, Cout = 24, 20, 6, 8
    rng = np.random.RandomState(5)
    kernel = rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.2

    for seed in range(3):
        feats, ids, valid = _random_scene(seed, H, W, C=Cin)
        grid, occ = scatter_max_to_grid(
            jnp.array(feats)[None], jnp.array(ids)[None],
            jnp.array(valid)[None], H, W,
        )
        dense_y = jax.lax.conv_general_dilated(
            grid, jnp.array(kernel), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        rows, site_ids, k = compact_segment_max(
            jnp.array(feats), jnp.array(ids), jnp.array(valid), H * W, 128
        )
        ids2, k2 = downsample_site_ids(site_ids, k, H, W, 256)
        nbr = down_conv_neighbor_table(ids2, k2, site_ids, k, H, W, 128)
        y = gather_conv(rows, nbr, jnp.array(kernel).reshape(9 * Cin, Cout))
        kv2 = int(k2)
        want = np.asarray(dense_y)[0].reshape(-1, Cout)[np.asarray(ids2)[:kv2]]
        np.testing.assert_allclose(np.asarray(y)[:kv2], want, atol=1e-4)


def test_lookup_ids_miss_and_padding():
    table = jnp.array([3, 7, 9, 100, 100], jnp.int32)  # padding id = 100
    got = np.asarray(
        lookup_ids(table, jnp.asarray(3), jnp.array([3, 4, 9, 100]), 5)
    )
    np.testing.assert_array_equal(got, [0, 5, 2, 5])  # 100 must MISS
