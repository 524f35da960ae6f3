"""Space-to-depth stage-1 execution is numerically equivalent to the fine
layout (same parameter tree, same outputs, same BN statistics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnet_lts_tpu.models.backbones.base import (
    expand_kernel_s2d,
    expand_kernel_s2d_down,
    s2d_pack,
    s2d_unpack,
)
from pillarnet_lts_tpu.models.backbones.pillar_resnet import PillarResNet18


def _inputs(seed=0, B=2, H=24, W=24, C=32):
    rng = np.random.RandomState(seed)
    occ = rng.rand(B, H, W) < 0.2
    grid = rng.randn(B, H, W, C).astype(np.float32) * occ[..., None]
    return jnp.asarray(grid), jnp.asarray(occ)


def test_expand_kernel_matches_fine_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 20, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))

    fine = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    coarse = jax.lax.conv_general_dilated(
        s2d_pack(x), expand_kernel_s2d(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(s2d_unpack(coarse, 5)), np.asarray(fine), atol=1e-5
    )

    fine2 = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    coarse2 = jax.lax.conv_general_dilated(
        s2d_pack(x), expand_kernel_s2d_down(w), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(coarse2), np.asarray(fine2),
                               atol=1e-5)


@pytest.mark.slow
def test_backbone_s2d_equivalent_eval_and_train():
    grid, occ = _inputs()
    fine_bb = PillarResNet18(s2d_stage1=False)
    s2d_bb = PillarResNet18(s2d_stage1=True)
    variables = fine_bb.init(jax.random.PRNGKey(0), grid, occ, train=False)

    out_f = fine_bb.apply(variables, grid, occ, train=False)
    out_s = s2d_bb.apply(variables, grid, occ, train=False)
    for k in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        xf, mf = out_f[k]
        xs, ms = out_s[k]
        np.testing.assert_allclose(
            np.asarray(xs), np.asarray(xf), atol=2e-4, err_msg=k
        )
        if mf is not None:
            np.testing.assert_array_equal(np.asarray(ms), np.asarray(mf))

    out_f, mut_f = fine_bb.apply(
        variables, grid, occ, train=True, mutable=["batch_stats"]
    )
    out_s, mut_s = s2d_bb.apply(
        variables, grid, occ, train=True, mutable=["batch_stats"]
    )
    for k in ("conv1", "conv4"):
        np.testing.assert_allclose(
            np.asarray(out_s[k][0]), np.asarray(out_f[k][0]), atol=2e-4,
            err_msg=k,
        )
    flat_f = jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"])
    flat_s = dict(jax.tree_util.tree_leaves_with_path(mut_s["batch_stats"]))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(flat_s[path]), np.asarray(leaf), atol=2e-4,
            err_msg=str(path),
        )


def test_backbone_s2d_odd_grid_falls_back():
    grid, occ = _inputs(H=22, W=25)
    bb = PillarResNet18(s2d_stage1=True)
    variables = bb.init(jax.random.PRNGKey(0), grid, occ, train=False)
    out = bb.apply(variables, grid, occ, train=False)
    assert out["conv1"][0].shape == grid.shape


def test_aligned_expand_kernel_matches_fine_conv():
    # phase-aligned (2,2) coarse formulation: 1.78x fine FLOPs instead of
    # the (3,3) expansion's 4x, exact numerics (incl. all boundaries)
    from pillarnet_lts_tpu.models.backbones.base import (
        expand_kernel_s2d_aligned,
        s2d_phase_align,
    )

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 20, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))

    fine = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    coarse = jax.lax.conv_general_dilated(
        s2d_phase_align(s2d_pack(x)), expand_kernel_s2d_aligned(w),
        (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(s2d_unpack(coarse, 5)), np.asarray(fine), atol=1e-5
    )
    # 9 of 16 tap slots per phase pair are nonzero
    wq = np.asarray(expand_kernel_s2d_aligned(w))
    nz = (np.abs(wq.reshape(4, 4, 3, 4, 5)) > 0).any(axis=(2, 4))
    assert int(nz.sum()) == 9 * 4
