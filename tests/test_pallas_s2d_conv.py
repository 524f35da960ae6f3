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
from pillarnet_lts_tpu.ops.pallas.s2d_conv_kernel import s2d_subm_conv_int8


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
