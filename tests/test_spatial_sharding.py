"""H-sharded BEV convs with halo exchange == single-device convs
(8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pillarnet_lts_tpu.parallel.spatial import make_spatial_conv


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("sp",))


def test_sharded_conv_matches_dense(mesh):
    rng = np.random.RandomState(0)
    B, H, W, C, CO = 2, 64, 32, 8, 16
    x = rng.randn(B, H, W, C).astype(np.float32)
    k = rng.randn(3, 3, C, CO).astype(np.float32) * 0.1

    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    run = make_spatial_conv(mesh, jnp.asarray(k))
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, "sp", None, None))
    )
    got = run(xs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_sharded_subm_conv_matches_masked_dense(mesh):
    rng = np.random.RandomState(1)
    B, H, W, C = 1, 64, 32, 4
    mask = rng.rand(B, H, W) > 0.6
    x = rng.randn(B, H, W, C).astype(np.float32) * mask[..., None]
    k = rng.randn(3, 3, C, C).astype(np.float32) * 0.1

    dense = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    want = np.asarray(dense) * mask[..., None]

    run = make_spatial_conv(mesh, jnp.asarray(k), masked=True)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, "sp", None, None))
    )
    ms = jax.device_put(
        jnp.asarray(mask), NamedSharding(mesh, P(None, "sp", None))
    )
    got = np.asarray(run(xs, ms))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # inactive sites exactly zero (SubM invariant holds across shard edges)
    np.testing.assert_allclose(got[~mask], 0.0)
