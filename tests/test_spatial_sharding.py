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


@pytest.mark.slow
def test_spatial_axis_end_to_end_equals_unsharded():
    """model.spatial_axis pins the BEV grid H-sharded (GSPMD); the sharded
    forward over an 8-device mesh must equal the unsharded forward on the
    demo config — end to end through reader/backbone/neck/head (SURVEY §5.7
    done-criterion)."""
    import os

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from pillarnet_lts_tpu.models import build_detector
    from pillarnet_lts_tpu.utils.config import Config

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "demo",
        "pillarnet18_demo.py",
    )
    cfg = Config.fromfile(cfg_path)

    model = build_detector(
        dict(cfg.model), train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg
    )
    model_sp = build_detector(
        {**dict(cfg.model), "spatial_axis": "sp"},
        train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg,
    )

    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        rng.uniform(-15, 15, (1, 512, 5)).astype(np.float32)
    )
    mask = jnp.ones((1, 512), bool)
    variables = model.init(jax.random.PRNGKey(3), pts, mask, train=False)

    base = jax.jit(
        lambda v, p, m: model.apply(v, p, m, train=False)
    )(variables, pts, mask)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    with jax.set_mesh(mesh):
        sharded = jax.jit(
            lambda v, p, m: model_sp.apply(v, p, m, train=False)
        )(variables, pts, mask)

    for pd_b, pd_s in zip(base, sharded):
        for k in pd_b:
            # partitioned convs reassociate partial sums; ~20 layers of
            # fp32 compounding puts the noise floor around 1e-3 relative
            np.testing.assert_allclose(
                np.asarray(pd_s[k]), np.asarray(pd_b[k]),
                rtol=1e-3, atol=5e-3, err_msg=k,
            )

    # train mode: BN batch statistics reduce globally across shards
    with jax.set_mesh(mesh):
        (preds_s, upd_s) = jax.jit(
            lambda v, p, m: model_sp.apply(
                v, p, m, train=True, mutable=["batch_stats"]
            )
        )(variables, pts, mask)
    (preds_b, upd_b) = jax.jit(
        lambda v, p, m: model.apply(
            v, p, m, train=True, mutable=["batch_stats"]
        )
    )(variables, pts, mask)
    flat_b = jax.tree_util.tree_leaves(upd_b)
    flat_s = jax.tree_util.tree_leaves(upd_s)
    for a, b in zip(flat_b, flat_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=5e-3)
