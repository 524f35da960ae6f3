import pytest
import numpy as np
import jax.numpy as jnp

from pillarnet_lts_tpu.ops.voxelize import PillarSpec, voxelize_points, scatter_max_to_grid

SPEC = PillarSpec(pillar_size=0.5, pc_range=(0.0, -2.0, -3.0, 4.0, 2.0, 1.0))

def test_spec_shape():
    assert SPEC.width == 8
    assert SPEC.height == 8
    assert SPEC.x_offset == 0.25
    assert SPEC.y_offset == -1.75

def test_voxelize_ids_and_features():
    pts = np.array(
        [
            [0.1, -1.9, 0.0, 1.0],   # pillar (0, 0)
            [3.9, 1.9, 0.0, 2.0],    # pillar (7, 7)
            [0.6, -1.9, 0.0, 3.0],   # pillar (1, 0)
            [-1.0, 0.0, 0.0, 4.0],   # out of range
        ],
        dtype=np.float32,
    )[None]
    mask = np.array([[True, True, True, True]])
    feats, flat, valid = voxelize_points(jnp.array(pts), jnp.array(mask), SPEC)
    flat = np.asarray(flat)[0]
    valid = np.asarray(valid)[0]
    assert flat[0] == 0
    assert flat[1] == 7 * 8 + 7
    assert flat[2] == 1
    assert flat[3] == 64  # sentinel
    assert list(valid) == [True, True, True, False]
    feats = np.asarray(feats)[0]
    # rel-center features for point 0: center (0.25, -1.75)
    np.testing.assert_allclose(feats[0, :2], [0.1 - 0.25, -1.9 + 1.75], atol=1e-6)
    # padded/out-of-range rows zeroed
    np.testing.assert_allclose(feats[3], 0.0)

def test_scatter_max_matches_numpy():
    rng = np.random.RandomState(0)
    B, N, C = 2, 128, 16
    H = W = 8
    feats = rng.randn(B, N, C).astype(np.float32)
    ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W)

    grid, occ = scatter_max_to_grid(
        jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W
    )
    grid = np.asarray(grid).reshape(B, H * W, C)
    occ = np.asarray(occ).reshape(B, H * W)

    for b in range(B):
        want = np.zeros((H * W, C), np.float32)
        want_occ = np.zeros(H * W, bool)
        for i in range(N):
            if not valid[b, i]:
                continue
            s = ids[b, i]
            if want_occ[s]:
                want[s] = np.maximum(want[s], feats[b, i])
            else:
                want[s] = feats[b, i]
                want_occ[s] = True
        np.testing.assert_array_equal(occ[b], want_occ)
        np.testing.assert_allclose(grid[b], want, atol=1e-6)

@pytest.mark.slow
def test_scatter_max_sorted_matches_xla():
    from pillarnet_lts_tpu.ops.voxelize import scatter_max_to_grid_sorted

    rng = np.random.RandomState(7)
    for N in (100, 128, 257):  # non-power-of-two lengths included
        B, C = 2, 12
        H, W = 16, 8
        feats = rng.randn(B, N, C).astype(np.float32)
        ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
        valid = rng.rand(B, N) > 0.3
        ids_m = np.where(valid, ids, H * W).astype(np.int32)
        a_grid, a_occ = scatter_max_to_grid(
            jnp.array(feats), jnp.array(ids_m), jnp.array(valid), H, W
        )
        b_grid, b_occ = scatter_max_to_grid_sorted(
            jnp.array(feats), jnp.array(ids_m), jnp.array(valid), H, W
        )
        np.testing.assert_array_equal(np.asarray(a_occ), np.asarray(b_occ))
        np.testing.assert_allclose(
            np.asarray(a_grid), np.asarray(b_grid), atol=1e-6
        )

def test_scatter_max_sorted_all_and_none_valid():
    from pillarnet_lts_tpu.ops.voxelize import scatter_max_to_grid_sorted

    rng = np.random.RandomState(3)
    B, N, C, H, W = 1, 64, 4, 4, 4
    feats = rng.randn(B, N, C).astype(np.float32)
    ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
    for valid in (np.ones((B, N), bool), np.zeros((B, N), bool)):
        ids_m = np.where(valid, ids, H * W).astype(np.int32)
        a = scatter_max_to_grid(
            jnp.array(feats), jnp.array(ids_m), jnp.array(valid), H, W
        )
        b = scatter_max_to_grid_sorted(
            jnp.array(feats), jnp.array(ids_m), jnp.array(valid), H, W
        )
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_allclose(
            np.asarray(a[0]), np.asarray(b[0]), atol=1e-6
        )

def test_scatter_max_sorted_invalid_points_with_inrange_ids():
    """Regression (ADVICE r2): invalid points carrying in-range ids must not
    mark their pillar occupied or leak finfo.min into the grid."""
    from pillarnet_lts_tpu.ops.voxelize import scatter_max_to_grid_sorted

    B, N, C, H, W = 1, 8, 3, 4, 4
    feats = np.full((B, N, C), 5.0, np.float32)
    ids = np.full((B, N), 3, np.int32)  # in-range id, but every point invalid
    valid = np.zeros((B, N), bool)
    grid, occ = scatter_max_to_grid_sorted(
        jnp.array(feats), jnp.array(ids), jnp.array(valid), H, W
    )
    assert not np.asarray(occ).any()
    np.testing.assert_array_equal(np.asarray(grid), 0.0)

    # mixed: one valid point at id 3, invalid points at id 5
    valid[0, 0] = True
    ids[0, 1:] = 5
    grid, occ = scatter_max_to_grid_sorted(
        jnp.array(feats), jnp.array(ids), jnp.array(valid), H, W
    )
    occ = np.asarray(occ).reshape(-1)
    assert occ[3] and not occ[5]
    np.testing.assert_allclose(np.asarray(grid).reshape(-1, C)[3], 5.0)
