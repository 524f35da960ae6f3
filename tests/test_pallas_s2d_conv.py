"""Bit-exactness of the phase-aligned Pallas s2d conv kernel.

`ops/pallas/s2d_conv_kernel.py` replaces the XLA `conv_bn_act_s2d`
eval/quant composite (quantize -> int8 s2d conv -> dequant -> re-zero ->
relu [-> residual]) for the stride-1 stage. The kernel must be
BIT-identical: the aligned (2, 2) kernel expansion only drops structural
zeros from the (3, 3) s2d expansion (same int32 sums), and the epilogue
replays the same f32 -> bf16 op order. Verified here in interpreter mode
against the exact shipped XLA composite (hardware equality was asserted
on-chip by tools/bench_r5_s2dconv_probe.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pillarnet_lts_tpu.models.backbones.base import (
    _tile4,
    conv_core_int8,
    expand_kernel_s2d,
    expand_kernel_s2d_aligned,
    quantize_act,
    s2d_pack,
    s2d_pack_mask,
)
from pillarnet_lts_tpu.ops.pallas.s2d_conv_kernel import (
    s2d_stage_int8,
    s2d_subm_conv_int8,
)


def _setup(seed=0, B=2, Hc=16, Wc=24, c=32, density=0.1):
    rng = np.random.RandomState(seed)
    fine = rng.randn(B, 2 * Hc, 2 * Wc, c).astype(np.float32)
    occ = rng.rand(B, 2 * Hc, 2 * Wc) < density
    fine = fine * occ[..., None]
    x = s2d_pack(jnp.asarray(fine, jnp.bfloat16))
    mask4 = s2d_pack_mask(jnp.asarray(occ))
    kfine = rng.randn(3, 3, c, c).astype(np.float32)
    s_w = np.maximum(np.abs(kfine).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    kq = jnp.asarray(np.clip(np.round(kfine / s_w), -127, 127).astype(np.int8))
    s_x = jnp.float32(np.abs(fine).max() / 127.0)
    inv = rng.rand(c).astype(np.float32) + 0.5
    shift = rng.randn(c).astype(np.float32)
    dq = _tile4(jnp.asarray(s_x * jnp.asarray(s_w, jnp.float32) * inv))
    sh = _tile4(jnp.asarray(shift))
    ident = (
        jnp.asarray(rng.randn(B, Hc, Wc, 4 * c), jnp.bfloat16)
        * jnp.repeat(mask4, c, axis=-1)
    )
    return x, mask4, kq, s_x, dq, sh, ident, c


def _xla_ref(x, mask4, kq, s_x, dq, sh, c, mode, ident=None):
    """The exact shipped conv_bn_act_s2d eval/quant composite."""
    yq = conv_core_int8(
        quantize_act(x, s_x), expand_kernel_s2d(kq), 1, ((1, 1), (1, 1))
    )
    y = (yq.astype(jnp.float32) * dq + sh).astype(jnp.bfloat16)
    neg = jnp.repeat(
        jnp.where(mask4, 0.0, -jnp.inf), c, axis=-1
    ).astype(jnp.bfloat16)
    if mode == "act":
        return jax.nn.relu(y + neg)
    if mode == "noact":
        return jnp.where(jnp.repeat(mask4, c, axis=-1), y, 0)
    return jax.nn.relu(y + neg + ident)


@pytest.mark.parametrize("mode", ["act", "noact", "res"])
def test_bit_exact_vs_xla_quant_path(mode):
    x, mask4, kq, s_x, dq, sh, ident, c = _setup()
    ref = _xla_ref(x, mask4, kq, s_x, dq, sh, c, mode,
                   ident if mode == "res" else None)
    out = s2d_subm_conv_int8(
        x, expand_kernel_s2d_aligned(kq), 1.0 / s_x, dq, sh, mask4,
        act=(mode == "act"),
        residual=ident if mode == "res" else None,
        interpret=True,
    )
    assert np.array_equal(
        np.asarray(ref, np.float32), np.asarray(out, np.float32)
    )


def test_non_tile_multiple_height_and_tile_sweep():
    # Hc=20 with tile_h=16 exercises the H padding path; tile_h=8 the
    # multi-band DMA sequencing
    x, mask4, kq, s_x, dq, sh, _, c = _setup(seed=3, Hc=20, Wc=20)
    ref = _xla_ref(x, mask4, kq, s_x, dq, sh, c, "act")
    for th in (8, 16):
        out = s2d_subm_conv_int8(
            x, expand_kernel_s2d_aligned(kq), 1.0 / s_x, dq, sh, mask4,
            act=True, tile_h=th, interpret=True,
        )
        assert np.array_equal(
            np.asarray(ref, np.float32), np.asarray(out, np.float32)
        ), f"tile_h={th}"


def _stage_setup(n_convs, seed=0, B=2, Hc=16, Wc=24, c=32, density=0.1):
    """n_convs random calibrated int8 convs + s2d inputs + both mask forms."""
    rng = np.random.RandomState(seed)
    fine = rng.randn(B, 2 * Hc, 2 * Wc, c).astype(np.float32)
    occ = rng.rand(B, 2 * Hc, 2 * Wc) < density
    fine = fine * occ[..., None]
    x = s2d_pack(jnp.asarray(fine, jnp.bfloat16))
    mask4 = s2d_pack_mask(jnp.asarray(occ))
    maskc = jnp.repeat(mask4, c, axis=-1).astype(jnp.bfloat16)
    convs = []
    for i in range(n_convs):
        kfine = rng.randn(3, 3, c, c).astype(np.float32) * 0.3
        s_w = np.maximum(np.abs(kfine).max(axis=(0, 1, 2)) / 127.0, 1e-12)
        kq = jnp.asarray(
            np.clip(np.round(kfine / s_w), -127, 127).astype(np.int8)
        )
        s_x = jnp.float32(0.04 + 0.01 * i)
        inv = rng.rand(c).astype(np.float32) * 0.6 + 0.2
        shift = (rng.randn(c) * 0.05).astype(np.float32)
        dq = _tile4(jnp.asarray(s_x * jnp.asarray(s_w, jnp.float32) * inv))
        sh = _tile4(jnp.asarray(shift))
        convs.append((kq, s_x, dq, sh))
    return x, mask4, maskc, convs, c


def _xla_stage(x, mask4, convs, c):
    """The exact shipped block chain: conv0 (mul re-zero), then residual
    pairs (mid act + tail act=False addneg, relu(out + identity))."""
    def one(h, conv, mode, ident=None):
        kq, s_x, dq, sh = conv
        return _xla_ref(h, mask4, kq, s_x, dq, sh, c, mode, ident)

    h = one(x, convs[0], "noact")
    ident = h
    for b in range((len(convs) - 1) // 2):
        h2 = one(h if b == 0 else ident, convs[1 + 2 * b], "act")
        ident = one(h2, convs[2 + 2 * b], "res", ident)
    return ident


def _stage_stacks(convs):
    w_stack = jnp.stack(
        [expand_kernel_s2d_aligned(kq) for kq, _, _, _ in convs]
    )
    p_stack = jnp.stack(
        [
            jnp.stack([dq, sh, jnp.full((128,), 1.0 / s_x, jnp.float32)])
            for _, s_x, dq, sh in convs
        ]
    )
    return w_stack, p_stack


@pytest.mark.parametrize("n_convs", [3, 5, 7])
def test_fused_stage_bit_exact(n_convs):
    x, mask4, maskc, convs, c = _stage_setup(n_convs)
    ref = _xla_stage(x, mask4, convs, c)
    w_stack, p_stack = _stage_stacks(convs)
    out = s2d_stage_int8(x, w_stack, p_stack, maskc, interpret=True)
    assert np.array_equal(
        np.asarray(ref, np.float32), np.asarray(out, np.float32)
    )


def test_fused_stage_padding_and_tile_sweep():
    # Hc=20 exercises the H-padding path at tile_h=16; tile_h=8 the
    # multi-band DMA sequencing with the 2n-row halo
    x, mask4, maskc, convs, c = _stage_setup(5, seed=4, Hc=20, Wc=20)
    ref = _xla_stage(x, mask4, convs, c)
    w_stack, p_stack = _stage_stacks(convs)
    for th in (8, 16):
        out = s2d_stage_int8(
            x, w_stack, p_stack, maskc, tile_h=th, interpret=True
        )
        assert np.array_equal(
            np.asarray(ref, np.float32), np.asarray(out, np.float32)
        ), f"tile_h={th}"


def test_backbone_s2d_pallas_route_bit_exact():
    """`s2d_pallas=True` routes the calibrated int8 stage-1 blocks through
    the Pallas kernel (base.py::pallas_s2d_gate) with bit-identical
    backbone outputs; later stages are untouched either way."""
    from pillarnet_lts_tpu.models.backbones.pillar_resnet import (
        PillarResNet18S,
    )

    rng = np.random.RandomState(1)
    H = W = 32
    mask = jnp.asarray(rng.rand(2, H, W) < 0.15)
    grid = jnp.asarray(
        rng.randn(2, H, W, 32).astype(np.float32)
    ) * mask[..., None]

    bb = PillarResNet18S(in_channels=32, quant=True)
    v = bb.init(jax.random.PRNGKey(0), grid, mask, train=False)
    _, aux = bb.apply(
        {k: v2 for k, v2 in v.items() if k != "quant"},
        grid, mask, train=False, mutable=["quant"],
    )
    vq = {**{k: v2 for k, v2 in v.items() if k != "quant"},
          "quant": aux["quant"]}
    ref = bb.apply(vq, grid, mask, train=False)
    bb_pl = PillarResNet18S(in_channels=32, quant=True, s2d_pallas=True)
    got = bb_pl.apply(vq, grid, mask, train=False)
    for name in ref:
        a, b = ref[name][0], got[name][0]
        assert np.array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        ), name


def test_aligned_expansion_matches_s2d_expansion_sums():
    """The (2,2) aligned kernel computes the same int32 sums as the (3,3)
    s2d kernel on dense int8 inputs (structural-zero taps dropped)."""
    rng = np.random.RandomState(7)
    c = 32
    kq = jnp.asarray(rng.randint(-127, 128, (3, 3, c, c)).astype(np.int8))
    xq = jnp.asarray(
        rng.randint(-127, 128, (1, 6, 6, 4 * c)).astype(np.int8)
    )
    ref = conv_core_int8(xq, expand_kernel_s2d(kq), 1, ((1, 1), (1, 1)))
    # aligned: shift each input phase block down-right by (ap, bp), then
    # VALID (2, 2) conv (the formulation the kernel implements in VMEM)
    wal = expand_kernel_s2d_aligned(kq)
    blocks = []
    for ap in (0, 1):
        for bp in (0, 1):
            p = 2 * ap + bp
            blk = xq[..., p * c : (p + 1) * c]
            blk = jnp.pad(blk, ((0, 0), (ap, 1 - ap), (bp, 1 - bp), (0, 0)))
            blocks.append(blk)
    a = jnp.concatenate(blocks, axis=-1)
    out = jax.lax.conv_general_dilated(
        a.astype(jnp.int8), wal, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_backbone_s2d_pallas_falls_back_without_calibration():
    """`s2d_pallas=True` with NO quant collection (uncalibrated model)
    must silently take the XLA path (pallas_s2d_gate passes but
    `s2d_fused_convs` returns None per conv), producing exactly the
    plain backbone's output — the flag is safe to set in a config before
    calibration has run."""
    from pillarnet_lts_tpu.models.backbones.pillar_resnet import (
        PillarResNet18S,
    )

    rng = np.random.RandomState(3)
    H = W = 32
    mask = jnp.asarray(rng.rand(1, H, W) < 0.15)
    grid = jnp.asarray(
        rng.randn(1, H, W, 32).astype(np.float32)
    ) * mask[..., None]

    bb = PillarResNet18S(in_channels=32, quant=True)
    v = bb.init(jax.random.PRNGKey(0), grid, mask, train=False)
    base = {k: v2 for k, v2 in v.items() if k != "quant"}
    ref = bb.apply(base, grid, mask, train=False)
    bb_pl = PillarResNet18S(in_channels=32, quant=True, s2d_pallas=True)
    got = bb_pl.apply(base, grid, mask, train=False)
    for name in ref:
        assert np.array_equal(
            np.asarray(ref[name][0], np.float32),
            np.asarray(got[name][0], np.float32),
        ), name
