"""remat=True must be a pure memory/FLOP trade: same outputs, same BN
statistics, same parameter gradients, same parameter tree as remat=False.

The flag activation-checkpoints every residual block / down stage
(`pillar_resnet.py::_PillarResNetBase.remat`) so bs=8 training fits one
16 GB chip; the reference has no analog (PyTorch keeps all activations,
`det3d/models/backbones/PillarResNet.py:73-149` at bs=4/GPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillarnet_lts_tpu.models.backbones.pillar_resnet import PillarResNet34


def _inputs(seed, h=64, w=64, c=32):
    rng = np.random.RandomState(seed)
    occ = rng.rand(1, h, w) < 0.15
    grid = rng.randn(1, h, w, c).astype(np.float32) * occ[..., None]
    return jnp.asarray(grid), jnp.asarray(occ)


def _run_train(grid, occ, **kw):
    model = PillarResNet34(
        in_channels=grid.shape[-1], with_conv5=True, **kw
    )
    variables = model.init(jax.random.PRNGKey(0), grid, occ, train=True)

    def loss_fn(params):
        out, updated = model.apply(
            {**variables, "params": params}, grid, occ, train=True,
            mutable=["batch_stats"],
        )
        return sum(
            jnp.abs(v[0].astype(jnp.float32)).mean() for v in out.values()
        ), updated["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    return variables, float(loss), stats, grads


@pytest.mark.slow
def test_remat_training_matches_plain():
    grid, occ = _inputs(0)
    v0, l0, s0, g0 = _run_train(grid, occ, remat=False)
    v1, l1, s1, g1 = _run_train(grid, occ, remat=True)

    # identical parameter tree (checkpoint compatibility)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        s1, s0,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        g1, g0,
    )


@pytest.mark.slow
def test_remat_policy_conv_out_matches_plain():
    """remat_policy='conv_out' (keep conv results, replay the elementwise
    tail) must also be numerics-neutral: same loss/stats/grads as no remat."""
    grid, occ = _inputs(2)
    v0, l0, s0, g0 = _run_train(grid, occ, remat=False)
    v1, l1, s1, g1 = _run_train(
        grid, occ, remat=True, remat_policy="conv_out"
    )
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        s1, s0,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        g1, g0,
    )


def test_remat_eval_matches_plain():
    grid, occ = _inputs(1)
    model0 = PillarResNet34(in_channels=32, remat=False)
    model1 = PillarResNet34(in_channels=32, remat=True)
    variables = model0.init(jax.random.PRNGKey(0), grid, occ, train=False)
    out0 = model0.apply(variables, grid, occ, train=False)
    out1 = model1.apply(variables, grid, occ, train=False)
    for k in out0:
        np.testing.assert_array_equal(
            np.asarray(out0[k][0]), np.asarray(out1[k][0]), err_msg=k
        )
