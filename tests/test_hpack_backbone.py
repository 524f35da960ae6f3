"""H-pack (H-only space-to-depth) execution of the 64-channel stage is
numerically equivalent to the fine layout — same parameter tree, same
eval outputs (training always runs the fine layout).

Replaces nothing in the reference (TPU-layout optimization); the fine
path it must match implements the spconv SubM semantics of
`det3d/models/backbones/base.py:183-213`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnet_lts_tpu.models.backbones.base import (
    expand_kernel_hpk,
    hpk_pack,
    hpk_pack_mask,
    hpk_unpack,
)
from pillarnet_lts_tpu.models.backbones.pillar_resnet import PillarResNet18


def _inputs(seed=0, B=2, H=24, W=24, C=32):
    rng = np.random.RandomState(seed)
    occ = rng.rand(B, H, W) < 0.2
    grid = rng.randn(B, H, W, C).astype(np.float32) * occ[..., None]
    return jnp.asarray(grid), jnp.asarray(occ)


def test_expand_kernel_hpk_matches_fine_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 20, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))

    fine = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    coarse = jax.lax.conv_general_dilated(
        hpk_pack(x), expand_kernel_hpk(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(hpk_unpack(coarse, 5)), np.asarray(fine), atol=1e-5
    )
    # each output phase uses 2 of the 3 coarse H-taps: 6 of 9 H x phase
    # slots are nonzero
    wq = np.asarray(expand_kernel_hpk(w)).reshape(3, 3, 2, 3, 2, 5)
    nz = (np.abs(wq) > 0).any(axis=(1, 3, 5))  # (t, q, p)
    assert int(nz.sum()) == 6


def test_expand_kernel_s2d_down_hpk_matches_fine_strided_conv():
    """The packed-emitting down kernel consumes the s2d stage-1 layout and
    produces hpk_pack(fine stride-2 conv output) in one conv."""
    from pillarnet_lts_tpu.models.backbones.base import (
        expand_kernel_s2d_down_hpk,
        s2d_pack,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 20, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))

    fine = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (2, 8, 10, 5)
    packed = jax.lax.conv_general_dilated(
        s2d_pack(x), expand_kernel_s2d_down_hpk(w), (2, 1),
        ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (2, 4, 10, 10)
    np.testing.assert_allclose(
        np.asarray(hpk_unpack(packed, 5)), np.asarray(fine), atol=1e-5
    )


def test_hpk_pack_roundtrip_and_mask():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 6, 4).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(hpk_unpack(hpk_pack(x), 4)), np.asarray(x)
    )
    m = jnp.asarray(rng.rand(2, 8, 6) < 0.5)
    pm = np.asarray(hpk_pack_mask(m))
    assert pm.shape == (2, 4, 6, 2)
    np.testing.assert_array_equal(pm[:, :, :, 0], np.asarray(m)[:, 0::2])
    np.testing.assert_array_equal(pm[:, :, :, 1], np.asarray(m)[:, 1::2])


def test_backbone_hpack_equivalent_eval():
    grid, occ = _inputs()
    plain = PillarResNet18(hpack=False)
    hpk = PillarResNet18(hpack=True)
    variables = plain.init(jax.random.PRNGKey(0), grid, occ, train=False)

    out_p = plain.apply(variables, grid, occ, train=False)
    out_h = hpk.apply(variables, grid, occ, train=False)
    for k in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        xp, mp = out_p[k]
        xh, mh = out_h[k]
        np.testing.assert_allclose(
            np.asarray(xh), np.asarray(xp), atol=2e-4, err_msg=k
        )
        if mp is not None:
            np.testing.assert_array_equal(np.asarray(mh), np.asarray(mp))

    # training ignores the flag entirely (fine layout, same stats)
    out_p, mut_p = plain.apply(
        variables, grid, occ, train=True, mutable=["batch_stats"]
    )
    out_h, mut_h = hpk.apply(
        variables, grid, occ, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_array_equal(
        np.asarray(out_h["conv2"][0]), np.asarray(out_p["conv2"][0])
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        mut_h["batch_stats"], mut_p["batch_stats"],
    )


def test_backbone_hpack_odd_height_falls_back():
    # H=22 -> conv2 stage H=11 (odd): the gate must skip packing
    grid, occ = _inputs(H=22, W=24)
    bb = PillarResNet18(hpack=True, s2d_stage1=False)
    variables = bb.init(jax.random.PRNGKey(0), grid, occ, train=False)
    plain = PillarResNet18(hpack=False, s2d_stage1=False)
    out_h = bb.apply(variables, grid, occ, train=False)
    out_p = plain.apply(variables, grid, occ, train=False)
    np.testing.assert_allclose(
        np.asarray(out_h["conv2"][0]), np.asarray(out_p["conv2"][0]),
        atol=2e-4,
    )


@pytest.mark.slow
def test_backbone_hpack_equivalent_chunked():
    # W-tiled form (chunk_nc) composes with H-pack: force chunking by
    # lowering chunk_min_w to the test grid
    grid, occ = _inputs(B=1, H=32, W=32)
    plain = PillarResNet18(hpack=False, chunk_min_w=8, chunk_nc=4)
    hpk = PillarResNet18(hpack=True, chunk_min_w=8, chunk_nc=4)
    variables = plain.init(jax.random.PRNGKey(0), grid, occ, train=False)
    out_p = plain.apply(variables, grid, occ, train=False)
    out_h = hpk.apply(variables, grid, occ, train=False)
    for k in ("conv2", "conv3", "conv4"):
        np.testing.assert_allclose(
            np.asarray(out_h[k][0]), np.asarray(out_p[k][0]), atol=2e-4,
            err_msg=k,
        )


def test_backbone_hpack_int8_bit_exact():
    """In quant mode the packed int8 stage must match the fine int8 stage
    BIT-exactly (the kernel expansion only moves taps; quantize/dequant
    see identical values)."""
    grid, occ = _inputs()
    plain = PillarResNet18(hpack=False, quant=True)
    hpk = PillarResNet18(hpack=True, quant=True)
    variables = plain.init(jax.random.PRNGKey(0), grid, occ, train=False)

    # calibrate on the plain path (packed calibration sees the same values;
    # use one collection for both to make the comparison exact)
    _, q = plain.apply(
        variables, grid, occ, train=False, mutable=["quant"]
    )
    variables = {**variables, **q}

    out_p = plain.apply(variables, grid, occ, train=False)
    out_h = hpk.apply(variables, grid, occ, train=False)
    for k in ("conv2", "conv3", "conv4"):
        np.testing.assert_array_equal(
            np.asarray(out_p[k][0]), np.asarray(out_h[k][0]), err_msg=k
        )
