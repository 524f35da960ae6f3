"""Pallas TPU kernel: phase-aligned s2d SubM conv (int8 deploy core).

The stride-1 conv1 stage runs in space-to-depth layout (see
`models/backbones/base.py`): XLA executes each SubM conv as a dense
(3, 3, 4C, 4C) conv whose kernel is 75% structural zeros — 4x the fine
conv's FLOPs, the price of full 128-lane MXU utilization under XLA's conv
lowering (reference conv semantics: SubMConv2d,
`det3d/models/backbones/base.py:183-213`).

The phase-ALIGNED formulation (`expand_kernel_s2d_aligned`) needs only a
(2, 2, 4C, 4C) kernel — 16/9 = 1.78x fine FLOPs at the same full lane
utilization — but was measured-and-rejected at the XLA level (round 3):
the per-conv `s2d_phase_align` input shuffle is a forced materialization
XLA cannot fuse into the conv, and it cost more than the FLOP saving
(conv1 stage 15.6 -> 40.7 ms). This kernel revives the aligned form where
the shuffle is free: the phase realign happens in VMEM between the input
DMA and the tap matmuls, shared by all four taps.

Per grid step (one H-band of one batch element):

  1. DMA a (tile_h + 2, W + 2, 4C) halo'd input band HBM -> VMEM
     (double-buffered across steps),
  2. quantize in-register with the conv's calibrated per-tensor scale
     (bit-identical to `base.py::quantize_act`),
  3. build the aligned tile A[i, j, (ap, bp) block] = q[i - ap, j - bp]
     with lane-block selects over four shifted views (the realign),
  4. four (tile_h, W, 4C) x (4C, 4C) int8 MXU matmuls — taps (s, t) of
     the aligned kernel — accumulated in int32,
  5. fused epilogue: f32 dequant (per-out-channel BN-folded vector) +
     shift, bf16 cast, optional residual add, optional ReLU, occupancy
     re-zero from the per-phase mask — all bit-identical to the XLA
     `conv_bn_act_s2d` eval/quant path (asserted in
     tests/test_pallas_s2d_conv.py).

Only the 4C == 128 case is accepted (PillarNet's 32-channel stage-1 —
the only shape the s2d recast exists for).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE_H = 32  # H-band rows per grid step (VMEM budget: see _vmem_bytes)


def _kernel(x_hbm, w_ref, p_ref, m_ref, *rest, tile_h, n_h, w_out, act,
            residual):
    if residual:
        res_ref, out_ref, sbuf, sem = rest
    else:
        out_ref, sbuf, sem = rest
        res_ref = None
    pid = pl.program_id(0)

    def band_dma(slot, step):
        b = step // n_h
        h0 = (step % n_h) * tile_h
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(h0, tile_h + 2)], sbuf.at[slot], sem.at[slot]
        )

    @pl.when(pid == 0)
    def _():
        band_dma(0, 0).start()

    @pl.when(pid + 1 < pl.num_programs(0))
    def _():
        band_dma((pid + 1) % 2, pid + 1).start()

    band_dma(pid % 2, pid).wait()
    x = sbuf[pid % 2]  # (tile_h + 2, W + 2, 128) bf16

    # quantize (bit-identical to base.py::quantize_act: round(f32 * inv))
    inv_s = p_ref[2, 0]
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv_s), -127.0, 127.0
    ).astype(jnp.int8)

    # aligned tile: A[i, j, (ap, bp) lane block] = q[i + 1 - ap, j + 1 - bp]
    # (q is the +1-padded band, so global A[i, j] = x_fine_s2d[i - ap, j - bp])
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h + 1, w_out + 1, _LANES), 2
    )
    blk = lane // (_LANES // 4)
    v00 = q[1:, 1 : w_out + 2]
    v01 = q[1:, 0 : w_out + 1]
    v10 = q[: tile_h + 1, 1 : w_out + 2]
    v11 = q[: tile_h + 1, 0 : w_out + 1]
    a = jnp.where(
        blk == 0, v00, jnp.where(blk == 1, v01, jnp.where(blk == 2, v10, v11))
    )

    # four aligned taps on the MXU, int32 accumulation
    acc = None
    for s in (0, 1):
        for t in (0, 1):
            d = jax.lax.dot_general(
                a[s : s + tile_h, t : t + w_out],
                w_ref[s, t],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = d if acc is None else acc + d

    # epilogue (bit-identical to the XLA path: f32 dequant -> bf16 ->
    # [+residual] -> [relu] -> occupancy re-zero)
    y = (
        acc.astype(jnp.float32) * p_ref[0][None, None, :]
        + p_ref[1][None, None, :]
    ).astype(out_ref.dtype)
    if residual:
        y = y + res_ref[0]
    if act or residual:
        y = jnp.maximum(y, 0)
    # per-phase occupancy -> 128-lane mask. Lane-blockwise expansion as int8
    # arithmetic (boolean broadcasts trip a Mosaic i1 relayout): for each
    # phase p, an iota-derived lane-block indicator times the (lane-splat)
    # phase column, summed.
    m4 = m_ref[0]  # (tile_h, w_out, 4) int8 per-phase occupancy
    mlane = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, w_out, _LANES), 2
    ) // (_LANES // 4)
    mexp = None
    for p in range(4):  # int32: the VPU has no int8 vector arithmetic
        term = (
            m4[:, :, p : p + 1].astype(jnp.int32)
            * (mlane == p).astype(jnp.int32)
        )
        mexp = term if mexp is None else mexp + term
    out_ref[0] = jnp.where(mexp > 0, y, jnp.zeros_like(y))


def s2d_subm_conv_int8(x, w_aligned, inv_s, dq, sh, mask4, *, act,
                       residual=None, tile_h=_TILE_H, interpret=False):
    """Phase-aligned s2d SubM conv, int8 MXU core, fused epilogue.

    x:         (B, Hc, Wc, 128) bf16/f32 s2d activations (phase-major).
    w_aligned: (2, 2, 128, 128) int8 — `expand_kernel_s2d_aligned` of the
               fine int8 kernel.
    inv_s:     scalar f32, 1 / per-tensor activation scale.
    dq, sh:    (128,) f32 dequant / shift vectors (`_tile4` of the fine
               per-out-channel vectors, BN fold included).
    mask4:     (B, Hc, Wc, 4) per-phase occupancy (bool / int).
    act:       apply ReLU.
    residual:  optional (B, Hc, Wc, 128) tensor added (then ReLU'd, matching
               the block's relu(out + identity)) before the re-zero.

    Returns (B, Hc, Wc, 128) x.dtype. Bit-identical to the XLA
    `conv_bn_act_s2d` eval/quant path (same quantize, same int32 sums —
    the aligned expansion only drops structural zeros — same f32 epilogue).
    """
    B, Hc, Wc, C = x.shape
    assert C == _LANES, f"s2d Pallas conv expects 4C == {_LANES}, got {C}"
    assert w_aligned.shape == (2, 2, _LANES, _LANES)
    n_h = -(-Hc // tile_h)
    HcP = n_h * tile_h
    # the HBM->VMEM band DMA needs its W extent sublane-aligned (8)
    WP = -(-(Wc + 2) // 8) * 8

    xpad = jnp.pad(
        x, ((0, 0), (1, HcP - Hc + 1), (1, WP - Wc - 1), (0, 0))
    )
    m4 = mask4.astype(jnp.int8)
    if HcP != Hc:
        m4 = jnp.pad(m4, ((0, 0), (0, HcP - Hc), (0, 0), (0, 0)))
    params = jnp.stack(
        [
            dq.astype(jnp.float32),
            sh.astype(jnp.float32),
            jnp.full((_LANES,), inv_s, jnp.float32),
        ]
    )

    grid = (B * n_h,)
    kern = partial(
        _kernel, tile_h=tile_h, n_h=n_h, w_out=Wc, act=act,
        residual=residual is not None,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (2, 2, _LANES, _LANES), lambda i: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((3, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, tile_h, Wc, 4),
            lambda i: (i // n_h, i % n_h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [xpad, w_aligned, params, m4]
    if residual is not None:
        resp = residual
        if HcP != Hc:
            resp = jnp.pad(resp, ((0, 0), (0, HcP - Hc), (0, 0), (0, 0)))
        in_specs.append(
            pl.BlockSpec(
                (1, tile_h, Wc, _LANES),
                lambda i: (i // n_h, i % n_h, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(resp.astype(x.dtype))

    out = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, HcP, Wc, _LANES), x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_h, Wc, _LANES),
            lambda i: (i // n_h, i % n_h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, WP, _LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :Hc] if HcP != Hc else out


# ---------------------------------------------------------------------------
# Fused-stage kernel: the WHOLE stride-1 stage in one pallas_call.
#
# The single-conv kernel above is a measured rejection (round 5,
# tools/bench_r5_s2dconv_probe.py, serving shape (8, 720, 720, 128) int8):
# XLA runs the 7-conv stage at 6.2 ms/frame vs 9.2 for per-conv Pallas —
# the stage is HBM-BANDWIDTH-bound, and per-conv execution pays a full
# activation round trip (plus the halo pad copy) per conv, which swamps
# the aligned form's 16/9-vs-4x FLOP saving. Fusing the stage removes the
# bandwidth term: ONE band read + ONE band write for all n convs, with
# every intermediate activation living in VMEM.
#
# MEASURED VERDICT (round 5, same probe, same shape, 3 interleaved
# rounds vs per-round floors): the fused form is ALSO a rejection —
# XLA 6.2 ms/frame vs fused 8.5 (tile_h=32) / 9.4 (tile_h=16), output
# within 1 bf16 ulp (0.0078 — the documented FMA contraction). Removing
# the inter-conv HBM traffic and 55% of the MACs was not enough: the
# in-VMEM work XLA does not pay (per-conv f32 round/clip quantize over
# full bands, the 4-view align selects, per-conv mask multiplies) plus
# the mask-band DMA (which doubles input bytes vs x alone) costs more
# than the saving. Kept in-tree, bit-tested, default-off
# (`backbone.s2d_pallas=False`) as documentation of the aligned-form
# design space for future hardware/compiler generations.
#
# Stage structure (reference `det3d/models/backbones/base.py:145-213`,
# PillarResNet stage 1): BlockV = conv0 (no act) + residual pair, then
# (nblocks - 1) residual pairs — n = 3 + 2 * (nblocks - 1) convs, n odd.
# Execution per grid step (one output H-band of tile_h rows):
#
#   DMA x band + maskc band (R = tile_h + 2n rows: 1 halo row per conv
#   per side) HBM -> VMEM, double-buffered. Then for conv i the valid
#   output rows are [i+1, R-i-1) — each conv consumes one halo row per
#   side, so after n convs exactly the tile_h output rows remain. Buffers:
#   A = running identity, B = mid output;
#     conv0:        x -> A            (act=False, re-zero)
#     mid  (odd i): A -> B            (relu, re-zero)
#     tail (even i): B (+A residual) -> A, or the output window when last
#                                      (relu(out + id), re-zero)
#   Each conv quantizes its input in-register with its own calibrated
#   scale and runs the four aligned int8 taps on the MXU exactly like the
#   single-conv kernel.
#
# Re-zero uses the stage-materialized channel-expanded mask (`maskc` in
# the backbone's eval mask dict) as a {0, 1} multiplier: zero halo rows
# make image-edge SAME padding exact through the whole chain (a conv
# output at a padded site is `shift`, which the mask zeroes before the
# next conv consumes it — the same invariant the XLA path maintains).
#
# Numerics: bit-exact to the XLA eval/quant composite in interpret mode
# (tests); on hardware the f32 dequant epilogue may contract to FMA,
# giving ~1 bf16-ulp differences per conv (observed 0.0078 max on the
# single-conv probe) — far below int8 quantization noise.
# ---------------------------------------------------------------------------


def _stage_kernel(x_hbm, m_hbm, w_ref, p_ref, out_ref, xs, ms, buf_a,
                  buf_b, sem, *, tile_h, n_h, w_out, n_convs):
    R = tile_h + 2 * n_convs
    pid = pl.program_id(0)

    def dma(slot, step):
        b = step // n_h
        h0 = (step % n_h) * tile_h
        return (
            pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(h0, R)], xs.at[slot], sem.at[slot, 0]
            ),
            pltpu.make_async_copy(
                m_hbm.at[b, pl.ds(h0, R)], ms.at[slot], sem.at[slot, 1]
            ),
        )

    @pl.when(pid == 0)
    def _():
        for c in dma(0, 0):
            c.start()
        # the inter-conv buffers' W borders (cols 0 and w_out + 1) are read
        # by every tap build but written by no conv — zero them once
        # (scratch persists across grid steps; data cols are fully
        # overwritten before every read)
        zero = jnp.zeros((R, 1, _LANES), buf_a.dtype)
        buf_a[:, 0:1] = zero
        buf_a[:, w_out + 1 : w_out + 2] = zero
        buf_b[:, 0:1] = zero
        buf_b[:, w_out + 1 : w_out + 2] = zero

    @pl.when(pid + 1 < pl.num_programs(0))
    def _():
        for c in dma((pid + 1) % 2, pid + 1):
            c.start()

    for c in dma(pid % 2, pid):
        c.wait()
    slot = pid % 2

    def conv(i, src, dst_rows):
        """Aligned int8 conv i: src rows [i, R - i) -> (m, w_out, 128) with
        the fused dequant epilogue; dst_rows = R - 2 * (i + 1)."""
        inv_s = p_ref[i, 2, 0]
        q = jnp.clip(
            jnp.round(src[i : R - i].astype(jnp.float32) * inv_s),
            -127.0, 127.0,
        ).astype(jnp.int8)
        m = dst_rows
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (m + 1, w_out + 1, _LANES), 2
        )
        blk = lane // (_LANES // 4)
        v00 = q[1:, 1 : w_out + 2]
        v01 = q[1:, 0 : w_out + 1]
        v10 = q[: m + 1, 1 : w_out + 2]
        v11 = q[: m + 1, 0 : w_out + 1]
        a = jnp.where(
            blk == 0, v00,
            jnp.where(blk == 1, v01, jnp.where(blk == 2, v10, v11)),
        )
        acc = None
        for s in (0, 1):
            for t in (0, 1):
                d = jax.lax.dot_general(
                    a[s : s + m, t : t + w_out],
                    w_ref[i, s, t],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = d if acc is None else acc + d
        return (
            acc.astype(jnp.float32) * p_ref[i, 0][None, None, :]
            + p_ref[i, 1][None, None, :]
        ).astype(buf_a.dtype)

    def mband(i):
        # mask rows matching conv i's output rows, {0,1} bf16
        return ms[slot][i + 1 : R - i - 1, 1 : w_out + 1]

    # conv0: x -> A (no act, multiplicative re-zero)
    y = conv(0, xs[slot], R - 2) * mband(0)
    buf_a[1 : R - 1, 1 : w_out + 1] = y

    n_blocks = (n_convs - 1) // 2
    for b in range(n_blocks):
        i_mid, i_tail = 1 + 2 * b, 2 + 2 * b
        y = jnp.maximum(conv(i_mid, buf_a, R - 2 * (i_mid + 1)), 0)
        buf_b[i_mid + 1 : R - i_mid - 1, 1 : w_out + 1] = y * mband(i_mid)
        y = conv(i_tail, buf_b, R - 2 * (i_tail + 1))
        res = buf_a[i_tail + 1 : R - i_tail - 1, 1 : w_out + 1]
        y = jnp.maximum(y + res, 0) * mband(i_tail)
        if i_tail == n_convs - 1:
            out_ref[0] = y
        else:
            buf_a[i_tail + 1 : R - i_tail - 1, 1 : w_out + 1] = y


def s2d_stage_int8(x, w_stack, p_stack, maskc, *, tile_h=16,
                   interpret=False):
    """Whole stride-1 s2d stage (BlockV + residual blocks), int8 fused.

    x:       (B, Hc, Wc, 128) bf16/f32 s2d activations (phase-major).
    w_stack: (n, 2, 2, 128, 128) int8 — per-conv `expand_kernel_s2d_aligned`
             kernels in execution order (n odd: conv0 + residual pairs).
    p_stack: (n, 3, 128) f32 — rows (dq, sh, inv_s-splat) per conv: the
             `_tile4`'d per-out-channel dequant / BN-shift vectors and the
             lane-splat 1 / activation scale.
    maskc:   (B, Hc, Wc, 128) {0,1} re-zero mask (the backbone's stage-
             materialized `maskc`, cast to x.dtype).

    Returns (B, Hc, Wc, 128) x.dtype: the stage output, equal to chaining
    the XLA `conv_bn_act_s2d` eval/quant path through the block structure
    (bit-exact in interpret mode; ~1 bf16 ulp/conv on hardware — FMA).
    """
    B, Hc, Wc, C = x.shape
    n = w_stack.shape[0]
    assert C == _LANES, f"s2d stage kernel expects 4C == {_LANES}, got {C}"
    assert n % 2 == 1 and n >= 3, f"n_convs must be odd >= 3, got {n}"
    assert w_stack.shape == (n, 2, 2, _LANES, _LANES)
    assert p_stack.shape == (n, 3, _LANES)
    n_h = -(-Hc // tile_h)
    HcP = n_h * tile_h
    R = tile_h + 2 * n
    WP = -(-(Wc + 2) // 8) * 8

    pad_h = (n, n + HcP - Hc)
    pad_w = (1, WP - Wc - 1)
    xpad = jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)))
    mpad = jnp.pad(
        maskc.astype(x.dtype), ((0, 0), pad_h, pad_w, (0, 0))
    )

    grid = (B * n_h,)
    kern = partial(
        _stage_kernel, tile_h=tile_h, n_h=n_h, w_out=Wc, n_convs=n,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, HcP, Wc, _LANES), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (n, 2, 2, _LANES, _LANES), lambda i: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n, 3, _LANES), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, Wc, _LANES),
            lambda i: (i // n_h, i % n_h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, WP, _LANES), x.dtype),   # x bands
            pltpu.VMEM((2, R, WP, _LANES), x.dtype),   # mask bands
            pltpu.VMEM((R, WP, _LANES), x.dtype),      # A (identity)
            pltpu.VMEM((R, WP, _LANES), x.dtype),      # B (mid)
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xpad, mpad, w_stack, p_stack)
    return out[:, :Hc] if HcP != Hc else out
