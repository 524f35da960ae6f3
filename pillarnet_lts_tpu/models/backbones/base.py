"""Masked-dense building blocks with exact spconv semantics.

Re-expression of the reference sparse blocks
(`det3d/models/backbones/base.py:145-213`) for TPU:

- SubMConv2d ("submanifold"): output sites == input sites. With a masked-dense
  layout (inactive sites held at exactly 0) a plain dense conv already gives
  the SubM contribution sum — inactive inputs contribute 0 — as long as the
  result is re-zeroed at inactive sites before the next conv consumes it. The
  masked BatchNorm performs that re-zeroing.
- SparseConv2d (regular, strided): occupancy dilates. The new mask is a
  3x3/stride-2 max-pool of the old occupancy, exactly spconv's output-site
  rule for kernel 3, stride 2, padding 1.
- BatchNorm1d-over-features semantics = mask-weighted statistics
  (see `models/utils/norm.py`).

All convs run as dense NHWC convolutions so XLA tiles them onto the MXU; at
nuScenes 0.075 m the early stages are <10% occupied, but the MXU's dense
throughput beats gather/scatter sparse emulation for these channel widths.

Inference fast path: at `train=False` every conv+BN pair runs FOLDED — the
BN affine (scale/sqrt(var+eps), shift) is multiplied into the conv kernel and
bias before the conv executes, so the big BEV maps never pay a separate
normalization pass. Measured on the v5e: the unfolded eval backbone spends
~39 ms/frame in BN elementwise passes and their layout copies (fp32
converts + {0,3,2,1}<->{3,1,2,0} relayouts visible in the optimized HLO);
folding removes them. Training numerics are untouched (masked batch stats).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from ..utils.norm import MaskedBatchNorm

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _name_conv(y):
    """Tag a conv output for remat policies (identity outside remat).

    With `remat_policy='conv_out'` the block backward keeps conv results
    resident and replays only the elementwise tail (BN normalize, bias,
    masks, relu) — the convs are the FLOPs, the tail is what the default
    full-replay remat spends most of its recompute on."""
    return _checkpoint_name(y, "conv_out")


def remat_policy(name: Optional[str]):
    """Map a config string to a jax.checkpoint policy (None = save nothing,
    the plain-remat default)."""
    if not name:
        return None
    if name == "conv_out":
        return jax.checkpoint_policies.save_only_these_names("conv_out")
    raise ValueError(f"unknown remat_policy {name!r}")


# ---------------------------------------------------------------------------
# Space-to-depth execution of the stride-1 stage.
#
# A 3x3 stride-1 conv over the fine (H, W, C) grid is EXACTLY a 3x3 conv over
# the space-to-depth (H/2, W/2, 4C) grid with a structured kernel: fine
# position (2u+a, 2v+b) becomes coarse cell (u, v), phase channel block
# (2a+b). Measured on the v5e, the 1440^2 32-channel stage runs at ~7-10
# TFLOP/s (32 of 128 MXU lanes, small contraction), while the same stage
# expressed as 720^2 128-channel convs runs at ~97 TFLOP/s — 4x the padded
# FLOPs at ~10x the rate, a ~3.5x net win. Numerics are exact up to fp
# accumulation order (the extra kernel entries are structural zeros).
# ---------------------------------------------------------------------------


def s2d_pack(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); phase-major channel blocks."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // 2, w // 2, 4 * c
    )


def s2d_unpack(x, channels):
    """(B, H/2, W/2, 4C) -> (B, H, W, C)."""
    b, h2, w2, _ = x.shape
    y = x.reshape(b, h2, w2, 2, 2, channels)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
        b, h2 * 2, w2 * 2, channels
    )


def s2d_pack_mask(mask):
    """(B, H, W) bool -> (B, H/2, W/2, 4) per-phase occupancy."""
    b, h, w = mask.shape
    y = mask.reshape(b, h // 2, 2, w // 2, 2)
    return jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, h // 2, w // 2, 4)


def expand_kernel_s2d(w):
    """(3, 3, ci, co) fine stride-1 kernel -> (3, 3, 4ci, 4co) s2d kernel."""
    _, _, ci, co = w.shape
    wp = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    s, ap = divmod(a + di, 2)
                    t, bp = divmod(b + dj, 2)
                    pin, pout = 2 * ap + bp, 2 * a + b
                    wp = jax.lax.dynamic_update_slice(
                        wp, w[di + 1:di + 2, dj + 1:dj + 2],
                        (s + 1, t + 1, pin * ci, pout * co),
                    )
    return wp


def expand_kernel_s2d_aligned(w):
    """(3, 3, ci, co) fine stride-1 kernel -> (2, 2, 4ci, 4co) coarse kernel
    for a PHASE-ALIGNED s2d input (`s2d_phase_align`).

    The plain expansion (`expand_kernel_s2d`) needs a (3, 3) coarse support
    because input phase (ap, bp) contributes from coarse offsets
    {-ap, 1-ap} x {-bp, 1-bp}; 9 of 36 tap slots are nonzero -> 4x the fine
    conv's FLOPs. Pre-shifting each input phase block down-right by
    (ap, bp) coarse cells folds those per-phase offsets into one common
    {0, 1} support: the kernel shrinks to (2, 2) with 9 of 16 slots used,
    i.e. 16/9 = 1.78x fine FLOPs at full 128-lane MXU utilization.

    MEASURED AND REJECTED as the default (round 3): the per-conv
    `s2d_phase_align` pass (4 slices + pads + concat, a forced input
    materialization XLA cannot fuse into the conv) costs far more than the
    FLOP saving — conv1 stage 15.6 -> 40.7 ms, full pipeline 87 -> 114 ms
    on the v5e. The output frame is phase-UNaligned, so every conv in a
    chain pays its own realign; an aligned-in/aligned-out formulation
    needs a (3,) support again (offset (di + ap - a)/2 spans {-1,0,1}).
    Kept (exact-numerics tested) as the record of that experiment."""
    _, _, ci, co = w.shape
    wp = jnp.zeros((2, 2, 4 * ci, 4 * co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    s, ap = divmod(a + di, 2)
                    t, bp = divmod(b + dj, 2)
                    pin, pout = 2 * ap + bp, 2 * a + b
                    wp = jax.lax.dynamic_update_slice(
                        wp, w[di + 1:di + 2, dj + 1:dj + 2],
                        (s + ap, t + bp, pin * ci, pout * co),
                    )
    return wp


def s2d_phase_align(x, chunked=False):
    """Shift each phase block (ap, bp) of a phase-major s2d tensor
    down-right by (ap, bp) coarse cells (zero-filled, matching the fine
    conv's SAME padding). Companion of `expand_kernel_s2d_aligned`.

    x: (B, Hc, Wc, 4C). When `chunked` (overlapped W tiles), the W shift
    consumes one left halo column instead of zero-padding: output width
    Wc - 1, and the following (2,)-wide unpadded conv consumes one more on
    the right — the same one-column-per-side halo decay as the (3,)-wide
    unaligned conv."""
    c = x.shape[-1] // 4
    wc = x.shape[2]
    blocks = []
    for ap in (0, 1):
        for bp in (0, 1):
            p = 2 * ap + bp
            blk = x[..., p * c:(p + 1) * c]
            # height grows to Hc+1 (pad ap on top, 1-ap below) so the
            # unpadded 2-tap conv sees both the shifted-in zero AND the
            # last real row; same for width when not chunked
            blk = jnp.pad(
                blk, ((0, 0), (ap, 1 - ap), (0, 0), (0, 0))
            )
            if chunked:
                blk = blk[:, :, 1 - bp: wc - bp]
            else:
                blk = jnp.pad(
                    blk, ((0, 0), (0, 0), (bp, 1 - bp), (0, 0))
                )
            blocks.append(blk)
    return jnp.concatenate(blocks, axis=-1)


def expand_kernel_s2d_down(w):
    """(3, 3, ci, co) fine stride-2 kernel -> (2, 2, 4ci, co) coarse stride-1
    kernel (use with padding ((1, 0), (1, 0)))."""
    _, _, ci, co = w.shape
    wp = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            s, ap = divmod(di, 2)
            t, bp = divmod(dj, 2)
            wp = jax.lax.dynamic_update_slice(
                wp, w[di + 1:di + 2, dj + 1:dj + 2],
                (s + 1, t + 1, (2 * ap + bp) * ci, 0),
            )
    return wp


def _tile4(v):
    return jnp.tile(v, 4)


# ---------------------------------------------------------------------------
# H-only space-to-depth ("H-pack") execution of the 64-channel stage.
#
# Stage 2 (9x 64-ch SubM convs at 720^2) uses half the MXU's 128 output
# lanes AND pads its physical lane dimension 64 -> 128, doubling every
# conv's HBM bytes. Packing two H-rows into the channel dim
# ((B, H, W, C) -> (B, H/2, W, 2C)) with a structured (3, 3, 2C, 2C)
# kernel is an exact-cycles wash on the MXU (2x FLOPs at 2x lane
# utilization) but halves the physical activation bytes and doubles the
# matmul M-tile occupancy. Measured on the v5e (tools/bench_r4_hs2d_probe
# .py, 9-conv chain at the in-model W-tiled shape (8, 720, 104, 64)):
# bf16 ~9.1 -> ~3.5 ms, int8 ~6.3 -> ~1.0 ms, int8 numerics bit-exact
# (the expansion only moves taps / inserts structural zeros).
#
# Fine output row 2r+p (phase p) at H-tap dy reads fine row 2r+p+dy =
# coarse row r+t phase q with p+dy = 2t+q — each phase uses 2 of the 3
# coarse H-taps; the other slots are structural zeros. Eval-only layout:
# training keeps the fine path (masked BN statistics + backward were
# measured layout-insensitive at this shape, ROADMAP round 4 phase 4).
# ---------------------------------------------------------------------------


def hpk_pack(x):
    """(B, H, W, C) -> (B, H/2, W, 2C); phase-major channel blocks."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, h // 2, w, 2 * c)


def hpk_unpack(x, channels):
    """(B, H/2, W, 2C) -> (B, H, W, C)."""
    b, h2, w, _ = x.shape
    y = x.reshape(b, h2, w, 2, channels)
    return jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(
        b, h2 * 2, w, channels
    )


def hpk_pack_mask(mask):
    """(B, H, W) bool -> (B, H/2, W, 2) per-phase occupancy."""
    b, h, w = mask.shape
    y = mask.reshape(b, h // 2, 2, w)
    return jnp.transpose(y, (0, 1, 3, 2))


def expand_kernel_hpk(w):
    """(3, 3, ci, co) fine stride-1 kernel -> (3, 3, 2ci, 2co) H-packed."""
    _, _, ci, co = w.shape
    wp = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for p in (0, 1):  # output phase: fine row 2r + p
        for dy in (-1, 0, 1):
            t, q = divmod(p + dy, 2)  # input coarse tap t, phase q
            for dx in (-1, 0, 1):
                wp = jax.lax.dynamic_update_slice(
                    wp, w[dy + 1:dy + 2, dx + 1:dx + 2],
                    (t + 1, dx + 1, q * ci, p * co),
                )
    return wp


def _tile2(v):
    return jnp.tile(v, 2)


def expand_kernel_s2d_down_hpk(w):
    """(3, 3, ci, co) fine stride-2 kernel -> (3, 2, 4ci, 2co) coarse kernel
    that consumes the s2d stage-1 layout and EMITS the H-packed layout
    directly (use with strides (2, 1), padding ((1, 0), (1, 0))).

    Composition of `expand_kernel_s2d_down` (s2d input -> fine out row y
    needs coarse rows y-1+h, h in {0, 1}) with the H-pack of the output
    (packed row u phase p = fine row 2u+p, read at coarse tap t = p + h).
    vs the fine-emitting form: 1.5x the FLOPs at 2x the output lanes
    (64 -> 128) = 0.75x MXU cycles, and the fine 128-lane-padded
    intermediate plus its pack relayout disappear."""
    dw = expand_kernel_s2d_down(w)  # (2, 2, 4ci, co)
    _, _, ci4, co = dw.shape
    wp = jnp.zeros((3, 2, ci4, 2 * co), dw.dtype)
    for p in (0, 1):
        for h in (0, 1):
            wp = jax.lax.dynamic_update_slice(
                wp, dw[h:h + 1], (p + h, 0, 0, p * co)
            )
    return wp


def conv_bn_act_hpk(conv: "MaskedConv", bn: "MaskedBatchNorm", x, masks,
                    train, act=True, chunked=False, rezero="mul"):
    """H-packed equivalent of `conv_bn_act` for a stride-1 SubM conv+BN —
    EVAL ONLY (training runs the fine layout; see section comment).

    x: (B, H/2, W, 2C_in); masks is a dict with `negc2` (channel-expanded
    additive re-zero mask, 0 at active / -inf at inactive sites, in the
    packed layout) and optionally `maskc2` (multiplicative form). The key
    names are the dict's structural marker — `Sparse2DBasicBlock` routes
    here when it sees `negc2`, which stays remat/jit-safe (pytree
    STRUCTURE is static where a boolean VALUE would trace)."""
    assert not train, "H-pack is an eval-only layout"
    hpad = (1, 1)
    wpad = (0, 0) if chunked else (1, 1)
    inv, shift = bn.fold_factors()
    if conv.use_bias:
        shift = conv.bias * inv + shift
    if conv.quant_ready():
        # quantize the FINE kernel per out-channel, expand the int8 taps
        # (bit-exact — expansion only moves taps); the packed 2co output
        # channels are phase-major tiles of the fine co, so the dequant
        # vector is the _tile2 of the fine one
        s_x = conv.in_scale()
        s_w = conv.weight_scale()
        yq = conv_core_int8(
            quantize_act(x, s_x), expand_kernel_hpk(conv.kernel_int8(s_w)),
            1, (hpad, wpad),
        )
        y = (
            yq.astype(jnp.float32) * _tile2(s_x * s_w * inv)
            + _tile2(shift)
        ).astype(conv.dtype)
    else:
        conv.observe(x)
        w = expand_kernel_hpk(conv.kernel)
        y = _name_conv(jax.lax.conv_general_dilated(
            x.astype(conv.dtype), (w * _tile2(inv)).astype(conv.dtype),
            (1, 1), (hpad, wpad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ))
        y = y + _tile2(shift).astype(y.dtype)
    if rezero == "addneg":
        n = masks["negc2"]
        y = y + (center_w(n, y.shape[2]) if chunked else n)
    else:
        m = masks["maskc2"]
        y = y * (center_w(m, y.shape[2]) if chunked else m)
    return nn.relu(y) if act else y


# ---------------------------------------------------------------------------
# int8 deploy path (eval only, opt-in via backbone `quant=True`).
#
# The v5e MXU runs int8 x int8 -> int32 at 2x its bf16 rate, and int8
# activations halve the HBM traffic of every conv read. Scheme: symmetric
# per-output-channel weight quantization (the BN fold factor `inv` is
# per-output-channel too, so it rides the dequant vector — the int8 kernel
# never changes when BN statistics do), symmetric per-tensor activation
# quantization with absmax calibration. Inactive sites are exact 0 in both
# domains (symmetric quant has no zero point), so the masked-dense spconv
# semantics above are preserved bit-exactly at the mask level.
#
# Calibration: each quantized conv `sow`s its input absmax into the 'quant'
# collection during a normal (bf16) eval forward run with mutable=['quant']
# (`runtime/quantize.py::calibrate`). Once the collection is threaded back
# in, `quant_ready()` flips the conv core to int8. The params/batch_stats
# trees are untouched — checkpoints stay compatible, and the reference
# deploy analog is TensorRT int8 post-training quantization of the same
# conv+BN+ReLU chains (reference exports via `det3d` -> ONNX -> TRT).
# ---------------------------------------------------------------------------

_QINIT = lambda: jnp.zeros((), jnp.float32)  # noqa: E731


def quantize_act(x, s_x):
    """bf16/fp32 -> int8 with symmetric per-tensor scale (XLA fuses this
    into the producing op's epilogue, so the int8 copy is usually free)."""
    q = jnp.round(x.astype(jnp.float32) * (1.0 / s_x))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def conv_core_int8(xq, wq, stride, padding):
    """int8 x int8 -> int32 NHWC conv (MXU int8 mode)."""
    strides = stride if isinstance(stride, tuple) else (stride, stride)
    return jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


# ---------------------------------------------------------------------------
# Overlapped W-tiling ("manual space-to-batch") for the wide stride-1 stages.
#
# XLA's SpaceToBatchConverter runs every batch-1 BEV conv as batch=8 tiles of
# W, but converts back to plain layout after each conv because the masked
# epilogue operands are not space-to-batch-ed — costing a ~400 MB
# pad+copy+copy round trip PER CONV (measured: conv1 33 ms / conv2 19 ms
# in-model vs ~10 / ~7 ms isolated). Tiling a whole stage ONCE with a halo
# equal to the stage's conv count keeps every tensor in batch-tile form for
# the stage's entire conv chain: each 3x3 conv runs with no W padding and
# consumes one halo column per side ("halo decay"), epilogues fuse, and the
# only data movement is one chunk + one reassembly per stage. The 2*halo/w0
# redundant columns (~15-20%) are pure MXU work — far cheaper than the
# relayouts (disabling the XLA pass instead measures SLOWER: batch-1 convs
# underutilize the core). Numerically exact: halo columns recompute exactly
# the neighbouring tile's interior values and are sliced off.
# ---------------------------------------------------------------------------


def w_chunk(x, nc, halo):
    """(B, H, W, ...) -> (B*nc, H, W/nc + 2*halo, ...) overlapped W tiles.

    Requires W % nc == 0. Edge tiles are zero-padded (same values a SAME-
    padded conv would see).
    """
    b, h, w = x.shape[:3]
    w0 = w // nc
    pad = ((0, 0), (0, 0), (halo, halo)) + ((0, 0),) * (x.ndim - 3)
    xp = jnp.pad(x, pad)
    parts = [
        xp[:, :, i * w0 : i * w0 + w0 + 2 * halo] for i in range(nc)
    ]
    y = jnp.stack(parts, axis=1)  # (B, nc, H, w0 + 2*halo, ...)
    return y.reshape((b * nc, h, w0 + 2 * halo) + x.shape[3:])


def w_unchunk(x, nc):
    """Inverse of `w_chunk` after the halo has fully decayed:
    (B*nc, H, w0, ...) -> (B, H, nc*w0, ...)."""
    bn_, h, w0 = x.shape[:3]
    b = bn_ // nc
    y = x.reshape((b, nc, h, w0) + x.shape[3:])
    y = jnp.moveaxis(y, 1, 2)  # (B, H, nc, w0, ...)
    return y.reshape((b, h, nc * w0) + x.shape[3:])


def center_w(x, w):
    """Symmetric center crop of the W axis (axis 2) to width `w`."""
    cur = x.shape[2]
    off = (cur - w) // 2
    return x if off == 0 else x[:, :, off : cur - off]


def chunk_gate(train, chunk_nc, chunk_train, w, min_w, batch=1):
    """Single source of truth for when a stage runs in w_chunk tiled form.

    W-tiling keeps XLA's batched conv form end-to-end (see module comment).
    TRAINING at batch >= 4 skips it: the backward stores batch x chunk_nc
    tiled activations and a bs=8 training graph OOMs 16 GB HBM at
    chunk_nc=8, while batched training convs gain little from the layout.
    EVAL tiles below batch 8 and skips at batch >= 8 — both directions
    measured on the int8 flagship (round 5, tools/archive/
    bench_r5_{bs8,tile}_probe.py, same-session on-chip ms/frame):
    bs=1 tiled 41.8 vs untiled 61.8; bs=4 tiled 45.7 vs untiled 72.6;
    bs=8 tiled 38.8 vs untiled 34.9. Small batches still pay the
    per-conv space-to-batch relayout round trip the tiling exists to
    avoid, while at batch 8 the convs are already batched and the tiles'
    halo recompute + chunk/unchunk relayouts are pure overhead."""
    return (
        (not train or chunk_train)
        and chunk_nc > 0
        and (not train or batch <= 2)
        and (train or batch < 8)
        and w >= min_w
        and w % chunk_nc == 0
    )


_NEG = -float("inf")  # additive re-zero sentinel: finite + -inf = -inf, relu(-inf) = 0


def conv_bn_act_s2d(conv: "MaskedConv", bn: MaskedBatchNorm, x, masks,
                    train, act=True, chunked=False, rezero="mul"):
    """s2d-space equivalent of `conv_bn_act` for a stride-1 SubM conv+BN.

    x: (B, H/2, W/2, 4C_in); masks is a dict:
      mask4 — (B, H/2, W/2, 4) per-phase occupancy (BN statistics);
      maskc — channel-expanded (B, H/2, W/2, 4C) multiplicative re-zero
              mask, materialized ONCE per stage (an in-graph `repeat` per
              conv defeats XLA's conv-epilogue fusion, measured 3x cost);
      negc  — additive re-zero mask (0 at active, -inf at inactive sites),
              used by the eval path when `rezero='addneg'`;
      stat4 — (chunked training) halo-zeroed statistics mask (halo columns
              duplicate neighbouring tiles' interiors and must not be
              double-counted; see MaskedBatchNorm.stat_mask).
    BN statistics aggregate across the 4 phase blocks of each fine channel,
    exactly the fine-space masked statistics.

    `chunked`: x is in `w_chunk` overlapped-tile form — the conv runs with
    no W padding (consuming one halo column per side) and the mask operands
    are center-cropped to the shrunk width.

    `rezero` (eval only): 'mul' multiplies by maskc; 'addneg' adds negc —
    XLA fuses the add into the conv epilogue where it does not fuse the
    multiply (measured: 12.4 -> 6.9 ms for the conv1 stage), leaving -inf
    at inactive sites. With act=True the relu maps those to exact 0; with
    act=False the caller must guarantee the output only feeds a
    (residual-add -> relu) whose other operand is already re-zeroed.
    """
    mask4 = masks["mask4"]
    c = conv.features
    w = expand_kernel_s2d(conv.kernel)
    hpad = (1, 1)
    wpad = (0, 0) if chunked else (1, 1)
    if train:
        stat4 = masks.get("stat4")
        b = _tile4(conv.bias) if conv.use_bias else None
        y = _name_conv(jax.lax.conv_general_dilated(
            x.astype(conv.dtype), w.astype(conv.dtype), (1, 1),
            (hpad, wpad), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ))
        if b is not None:
            y = y + b.astype(y.dtype)
        bb, hh, ww, _ = y.shape
        m4 = center_w(mask4, ww) if chunked else mask4
        s4 = center_w(stat4, ww) if (chunked and stat4 is not None) else None
        y = bn(y.reshape(bb, hh, ww, 4, c), mask=m4, train=True,
               stat_mask=s4)
        y = y.reshape(bb, hh, ww, 4 * c)
    else:
        inv, shift = bn.fold_factors()
        if conv.use_bias:
            shift = conv.bias * inv + shift
        if conv.quant_ready():
            # int8 core: quantize the FINE kernel per out-channel, expand
            # the int8 taps (expansion only moves taps / inserts structural
            # zeros, which quantize exactly); the coarse 4co output channels
            # are phase-major tiles of the fine co, so the dequant vector is
            # the _tile4 of the fine one.
            s_x = conv.in_scale()
            s_w = conv.weight_scale()
            yq = conv_core_int8(
                quantize_act(x, s_x), expand_kernel_s2d(conv.kernel_int8(s_w)),
                1, (hpad, wpad),
            )
            y = (
                yq.astype(jnp.float32) * _tile4(s_x * s_w * inv)
                + _tile4(shift)
            ).astype(conv.dtype)
        else:
            conv.observe(x)
            y = jax.lax.conv_general_dilated(
                x.astype(conv.dtype), (w * _tile4(inv)).astype(conv.dtype),
                (1, 1), (hpad, wpad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y + _tile4(shift).astype(y.dtype)
        if rezero == "addneg" and "negc" in masks:
            n = masks["negc"]
            y = y + (center_w(n, y.shape[2]) if chunked else n)
        else:
            m = masks["maskc"]
            y = y * (center_w(m, y.shape[2]) if chunked else m)
    return nn.relu(y) if act else y


_LANES_PL = 128  # the Pallas s2d kernels accept exactly one lane width


def pallas_s2d_gate(enabled, train, chunked, planes):
    """Route the stride-1 s2d stage through the FUSED Pallas stage kernel
    (`ops/pallas/s2d_conv_kernel.py::s2d_stage_int8`)?

    Engages only on the int8 eval path (the kernel core is int8 — the
    per-conv calibration check lives in the blocks' `s2d_fused_convs`),
    untiled (the W-chunked layout carries halo columns and no W padding,
    which the kernel does not model), at full 128-lane width (4*planes ==
    128, the only shape the s2d recast exists for). BOTH Pallas forms are
    measured rejections at the serving shape (round 5,
    tools/bench_r5_s2dconv_probe.py, (8, 720, 720, 128) int8, 3 rounds
    vs per-round floors): XLA 6.2 ms/frame vs per-conv Pallas 9.2 vs
    fused whole-stage 8.5 (th=32) / 9.4 (th=16). The fused form removes
    the inter-conv HBM round trips and runs 16/9x fine FLOPs (vs XLA's
    4x padded) yet still loses ~2.3 ms/frame — the in-VMEM tax (per-conv
    f32 quantize over full bands, 4-view align selects, mask multiplies,
    and the mask-band DMA doubling input bytes) exceeds what the
    bandwidth+FLOP savings buy. Default stays OFF (`s2d_pallas=False`);
    the kernel remains in-tree and bit-tested as the layout for future
    hardware/compiler generations, like the compact-sparse path."""
    return (
        enabled and not train and not chunked and 4 * planes == _LANES_PL
    )


def _fused_conv_params(*pairs):
    """(w_aligned, inv_s, dq, sh) per (conv, bn) pair for the fused Pallas
    stage kernel — the same int8 quantities `conv_bn_act_s2d`'s quant
    branch computes — or None unless every conv is calibrated."""
    out = []
    for conv, bn in pairs:
        if not conv.quant_ready():
            return None
        inv, shift = bn.fold_factors()
        if conv.use_bias:
            shift = conv.bias * inv + shift
        s_x = conv.in_scale()
        s_w = conv.weight_scale()
        out.append((
            expand_kernel_s2d_aligned(conv.kernel_int8(s_w)),
            1.0 / s_x,
            _tile4(s_x * s_w * inv),
            _tile4(shift),
        ))
    return out


def s2d_fused_stage(x, conv_params, maskc):
    """Run the whole stride-1 s2d stage on the fused Pallas kernel.

    conv_params: concatenated `s2d_fused_convs()` of the stage's blocks
    (BlockV then Blocks — n odd). maskc: the stage-materialized
    channel-expanded {0,1} re-zero mask the eval path already builds."""
    from ...ops.pallas.s2d_conv_kernel import s2d_stage_int8

    w_stack = jnp.stack([p[0] for p in conv_params])
    p_stack = jnp.stack(
        [
            jnp.stack([dq, sh, jnp.full((_LANES_PL,), inv_s, jnp.float32)])
            for _, inv_s, dq, sh in conv_params
        ]
    )
    return s2d_stage_int8(
        x, w_stack, p_stack, maskc,
        interpret=jax.default_backend() == "cpu",
    )


def dilate_mask(mask, stride: int = 2):
    """spconv SparseConv2d(k=3, stride, pad=1) output-site rule: a stride-s
    3x3 max-pool with SAME-style padding 1 over the occupancy."""
    m = mask.astype(jnp.float32)[..., None]
    out = nn.max_pool(
        m, window_shape=(3, 3), strides=(stride, stride), padding=((1, 1), (1, 1))
    )
    return out[..., 0] > 0.5


class MaskedConv(nn.Module):
    """kxk conv over a masked-dense map; caller guarantees inactive sites are
    zero. Bias matches reference SubM blocks (bias=True when a norm follows —
    `base.py:120`, `:154`, `:192` set bias = norm_cfg is not None).

    Owns its kernel/bias params directly (setup-style) so a following
    MaskedBatchNorm can be folded into them at inference via `folded`.
    `in_features` is therefore explicit (no lazy shape inference).
    """

    features: int
    in_features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    bias_init: Any = nn.initializers.zeros
    kernel_init: Any = _KAIMING
    # int8 deploy mode (see module comment): False = bf16/fp32 compute.
    # When True, eval-time `folded` calls observe input absmax (calibration,
    # mutable 'quant' collection) and switch the conv core to int8 once a
    # calibrated scale is present in the variables.
    quant: bool = False

    def setup(self):
        k = self.kernel_size
        self.kernel = self.param(
            "kernel", self.kernel_init,
            (k, k, self.in_features, self.features), jnp.float32,
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", self.bias_init, (self.features,), jnp.float32
            )

    def _run(self, x, w, b, pad_w=True):
        pad = (self.kernel_size - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad) if pad_w else (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = _name_conv(y)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y

    def __call__(self, x, pad_w=True):
        b = self.bias if self.use_bias else None
        return self._run(x, self.kernel, b, pad_w=pad_w)

    def folded(self, x, inv, shift, pad_w=True):
        """conv with the following BN's affine folded in:
        BN(conv(x) + cb) = conv(x) * inv + (cb * inv + shift).

        In quant mode (calibrated) the core runs int8: the BN fold factor
        and both quant scales ride the int32 -> bf16 dequant epilogue."""
        b = self.bias * inv + shift if self.use_bias else shift
        if self.quant_ready():
            s_x = self.in_scale()
            s_w = self.weight_scale()
            pad = (self.kernel_size - 1) // 2
            padding = ((pad, pad), (pad, pad) if pad_w else (0, 0))
            y = conv_core_int8(
                quantize_act(x, s_x), self.kernel_int8(s_w),
                self.stride, padding,
            )
            return (
                y.astype(jnp.float32) * (s_x * s_w * inv) + b
            ).astype(self.dtype)
        self.observe(x)
        return self._run(x, self.kernel * inv, b, pad_w=pad_w)

    # ---- int8 deploy helpers (see module comment) --------------------------
    def observe(self, x):
        """Calibration hook: record the running input absmax (only stored
        when the 'quant' collection is mutable; otherwise the reduction is
        dead code XLA eliminates)."""
        if self.quant:
            self.sow(
                "quant", "in_absmax",
                jnp.max(jnp.abs(x)).astype(jnp.float32),
                reduce_fn=jnp.maximum, init_fn=_QINIT,
            )

    def quant_ready(self):
        return self.quant and self.has_variable("quant", "in_absmax")

    def in_scale(self):
        """Per-tensor symmetric activation scale from the calibrated absmax."""
        amax = self.get_variable("quant", "in_absmax")
        return jnp.maximum(amax, 1e-6) / 127.0

    def weight_scale(self):
        """Per-output-channel symmetric weight scale (fp32, raw kernel —
        the BN fold factor stays in the dequant vector)."""
        s = jnp.max(jnp.abs(self.kernel), axis=(0, 1, 2)) / 127.0
        return jnp.maximum(s, 1e-12)

    def kernel_int8(self, s_w):
        return jnp.clip(
            jnp.round(self.kernel * (1.0 / s_w)), -127.0, 127.0
        ).astype(jnp.int8)


def conv_bn_act(conv: MaskedConv, bn: MaskedBatchNorm, x, mask, train,
                act=True, chunked=False, rezero="mul"):
    """conv -> masked BN -> optional ReLU, with the BN affine folded into the
    conv weights at inference. `chunked`: `w_chunk` overlapped-tile form —
    no W padding, mask center-cropped to the shrunk width; in training
    `mask` is then a (re-zero mask, halo-zeroed stat mask) pair.

    `rezero='addneg'` (eval): re-zero by adding -inf at inactive sites
    instead of multiplying — the add fuses into the conv epilogue (see
    conv_bn_act_s2d). With act=True the relu restores exact zeros; with
    act=False the caller must route the output through a residual-add+relu
    whose other operand is already zeroed."""
    if train:
        y = conv(x, pad_w=not chunked)
        if chunked:
            m_full, m_stat = mask
            y = bn(y, mask=center_w(m_full, y.shape[2]), train=True,
                   stat_mask=center_w(m_stat, y.shape[2]))
        else:
            y = bn(y, mask=mask, train=True)
    else:
        inv, shift = bn.fold_factors()
        y = conv.folded(x, inv, shift, pad_w=not chunked)
        negc = None
        if isinstance(mask, dict):
            negc = mask.get("negc")
            mask = mask["m"]
        if mask is not None:
            if rezero == "addneg" and negc is not None:
                # stage-materialized channel-expanded additive mask fuses
                # best (D3 in the probe log: 12.3 mul / 11.3 broadcast-add /
                # 10.7 materialized-add for the conv2 stage)
                y = y + center_w(negc, y.shape[2])
            else:
                m = center_w(mask, y.shape[2]) if chunked else mask
                if rezero == "addneg":
                    y = y + jnp.where(m, 0.0, _NEG).astype(y.dtype)[..., None]
                else:
                    y = y * m.astype(y.dtype)[..., None]
    return nn.relu(y) if act else y


class Sparse2DBasicBlock(nn.Module):
    """Residual block of two SubM convs (`base.py:183-213`).

    With `s2d=True` the block executes in space-to-depth layout: x is
    (B, H/2, W/2, 4*planes) and `mask` is the (B, H/2, W/2, 4) per-phase
    occupancy. Parameters are identical either way.
    """

    planes: int
    momentum: float = 0.01
    eps: float = 1e-3
    dtype: Any = jnp.float32
    s2d: bool = False
    quant: bool = False

    def setup(self):
        kw = dict(momentum=self.momentum, eps=self.eps, dtype=self.dtype)
        ckw = dict(dtype=self.dtype, quant=self.quant)
        self.conv1 = MaskedConv(self.planes, self.planes, **ckw)
        self.bn1 = MaskedBatchNorm(self.planes, **kw)
        self.conv2 = MaskedConv(self.planes, self.planes, **ckw)
        self.bn2 = MaskedBatchNorm(self.planes, **kw)

    def s2d_fused_convs(self):
        """Per-conv params for the fused Pallas stage kernel, execution
        order, or None unless every conv is int8-calibrated (see
        base.py::s2d_fused_stage)."""
        return _fused_conv_params((self.conv1, self.bn1),
                                  (self.conv2, self.bn2))

    def __call__(self, x, mask, train: bool = True, chunked: bool = False):
        if isinstance(mask, dict) and "negc2" in mask:
            run = conv_bn_act_hpk  # H-packed eval layout (structural key)
        else:
            run = conv_bn_act_s2d if self.s2d else conv_bn_act
        identity = x
        # eval re-zero: conv1's relu restores zeros from the additive mask;
        # conv2 (act=False) leaves -inf at inactive sites, which the final
        # relu(out + identity) maps back to 0 (identity is already zeroed)
        out = run(self.conv1, self.bn1, x, mask, train, chunked=chunked,
                  rezero="addneg")
        out = run(self.conv2, self.bn2, out, mask, train, act=False,
                  chunked=chunked, rezero="addneg")
        if chunked:
            identity = center_w(identity, out.shape[2])
        return nn.relu(out + identity)

    def compact(self, rows, nbr, valid, train: bool = True):
        """Gather-based execution over compact active-site rows (same
        parameters/statistics — see `compact_exec.py`)."""
        from .compact_exec import basic_block_compact

        return basic_block_compact(self, rows, nbr, valid, train)


class Sparse2DBasicBlockV(nn.Module):
    """Entry block: extra SubM conv + BN before the residual pair
    (`base.py:145-180`)."""

    planes: int
    momentum: float = 0.01
    eps: float = 1e-3
    dtype: Any = jnp.float32
    in_planes: Optional[int] = None  # input channels; defaults to planes
    s2d: bool = False
    quant: bool = False

    def setup(self):
        kw = dict(momentum=self.momentum, eps=self.eps, dtype=self.dtype)
        ckw = dict(dtype=self.dtype, quant=self.quant)
        cin = self.planes if self.in_planes is None else self.in_planes
        self.conv0 = MaskedConv(self.planes, cin, **ckw)
        self.bn0 = MaskedBatchNorm(self.planes, **kw)
        self.conv1 = MaskedConv(self.planes, self.planes, **ckw)
        self.bn1 = MaskedBatchNorm(self.planes, **kw)
        self.conv2 = MaskedConv(self.planes, self.planes, **ckw)
        self.bn2 = MaskedBatchNorm(self.planes, **kw)

    def s2d_fused_convs(self):
        """Per-conv params for the fused Pallas stage kernel, execution
        order, or None unless every conv is int8-calibrated at the
        kernel's square 128-lane shape (see base.py::s2d_fused_stage)."""
        if self.in_planes is not None and self.in_planes != self.planes:
            return None  # conv0's INPUT must also be 128 lanes
        return _fused_conv_params((self.conv0, self.bn0),
                                  (self.conv1, self.bn1),
                                  (self.conv2, self.bn2))

    def __call__(self, x, mask, train: bool = True, chunked: bool = False):
        run = conv_bn_act_s2d if self.s2d else conv_bn_act
        # conv0 (act=False) feeds conv1's INPUT directly, so it must produce
        # true zeros at inactive sites -> multiplicative re-zero; the later
        # convs use the fused additive mask (see Sparse2DBasicBlock)
        x = run(self.conv0, self.bn0, x, mask, train, act=False,
                chunked=chunked, rezero="mul")
        identity = x
        out = run(self.conv1, self.bn1, x, mask, train, chunked=chunked,
                  rezero="addneg")
        out = run(self.conv2, self.bn2, out, mask, train, act=False,
                  chunked=chunked, rezero="addneg")
        if chunked:
            identity = center_w(identity, out.shape[2])
        return nn.relu(out + identity)

    def compact(self, rows, nbr, valid, train: bool = True):
        """Gather-based execution over compact active-site rows."""
        from .compact_exec import basic_block_v_compact

        return basic_block_v_compact(self, rows, nbr, valid, train)


class SparseDownStage(nn.Module):
    """Strided SparseConv2d + BN + ReLU followed by N residual blocks — one
    `convK` stage of the PillarResNets (`PillarResNet.py:86-108`)."""

    channels: int
    num_blocks: int
    stride: int = 2
    momentum: float = 0.01
    eps: float = 1e-3
    dtype: Any = jnp.float32
    in_channels: Optional[int] = None  # defaults to channels // 2
    s2d_in: bool = False  # input arrives in s2d layout (stride must be 2)
    # overlapped W-tiling of the residual blocks (see w_chunk); 0 disables;
    # applies only when the stage output W >= chunk_min_w. chunk_train
    # extends it to the training graph (numerically exact: BN statistics
    # exclude halo columns via stat_mask).
    chunk_nc: int = 0
    chunk_min_w: int = 512
    chunk_train: bool = True
    # activation-checkpoint each residual block: the stage backward then
    # holds ONE block's space-to-batch/BN fp32 temps at a time instead of
    # all of them (a 720^2 x 64 stage keeps ~9 x 550 MB temps resident
    # without it). Engaged by the backbone-level `remat` flag.
    remat: bool = False
    # checkpoint policy for remat'ed blocks (None = full replay;
    # 'conv_out' = keep conv results, replay only the elementwise tail)
    remat_policy: Optional[str] = None
    quant: bool = False
    # eval-only H-pack of the residual blocks (see conv_bn_act_hpk): engages
    # when the stage channels fit 2x into the 128 MXU lanes (i.e. the
    # 64-channel conv2 stage). Exact numerics (int8 bit-exact; bf16 up to
    # conv accumulation order). Training keeps the fine layout.
    hpack: bool = False

    def setup(self):
        cin = (self.channels // 2 if self.in_channels is None
               else self.in_channels)
        self.down_conv = MaskedConv(
            self.channels, cin, stride=self.stride, use_bias=False,
            dtype=self.dtype, quant=self.quant,
        )
        self.down_bn = MaskedBatchNorm(
            self.channels, momentum=self.momentum, eps=self.eps,
            dtype=self.dtype,
        )
        # flax nn.remat argnums count `self` as 0; only positional call
        # args can be static: (self, x, mask, train, chunked)
        block_cls = (nn.remat(Sparse2DBasicBlock, static_argnums=(3, 4),
                              policy=remat_policy(self.remat_policy))
                     if self.remat else Sparse2DBasicBlock)
        self.blocks = [
            block_cls(
                self.channels, self.momentum, self.eps, dtype=self.dtype,
                quant=self.quant, name=f"block{i}",
            )
            for i in range(self.num_blocks)
        ]

    def __call__(self, x, mask, train: bool = True):
        """mask is always the FINE-space occupancy of the input stage, even
        when `s2d_in` (the s2d layout only changes how x is stored)."""
        new_mask = dilate_mask(mask, self.stride)
        # eval-only H-pack of the block chain (see conv_bn_act_hpk): only
        # worthwhile below full MXU lane width, i.e. the 64-channel stage
        want_hpk = (
            self.hpack and not train and 2 * self.channels <= 128
        )
        packed = False  # y is already in H-packed layout
        if self.s2d_in and want_hpk and x.shape[1] % 2 == 0:
            # the down conv EMITS the packed layout directly: full output
            # lanes (vs 64 = half) at 1.5x taps = 0.75x MXU cycles, and no
            # fine 128-lane-padded intermediate or pack relayout
            assert self.stride == 2
            inv, shift = self.down_bn.fold_factors()
            if self.down_conv.quant_ready():
                s_x = self.down_conv.in_scale()
                s_w = self.down_conv.weight_scale()
                yq = conv_core_int8(
                    quantize_act(x, s_x),
                    expand_kernel_s2d_down_hpk(
                        self.down_conv.kernel_int8(s_w)
                    ),
                    (2, 1), ((1, 0), (1, 0)),
                )
                y = (
                    yq.astype(jnp.float32) * _tile2(s_x * s_w * inv)
                    + _tile2(shift)
                ).astype(self.dtype)
            else:
                self.down_conv.observe(x)
                w = expand_kernel_s2d_down_hpk(self.down_conv.kernel)
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    (w * _tile2(inv)).astype(self.dtype),
                    (2, 1), ((1, 0), (1, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                y = y + _tile2(shift).astype(y.dtype)
            pm2 = hpk_pack_mask(new_mask)
            y = y * jnp.repeat(pm2, self.channels, axis=-1).astype(y.dtype)
            y = nn.relu(y)
            packed = True
        elif self.s2d_in:
            assert self.stride == 2
            w = expand_kernel_s2d_down(self.down_conv.kernel)
            if train:
                y = _name_conv(jax.lax.conv_general_dilated(
                    x.astype(self.dtype), w.astype(self.dtype), (1, 1),
                    ((1, 0), (1, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ))
                y = self.down_bn(y, mask=new_mask, train=True)
            else:
                inv, shift = self.down_bn.fold_factors()
                if self.down_conv.quant_ready():
                    s_x = self.down_conv.in_scale()
                    s_w = self.down_conv.weight_scale()
                    yq = conv_core_int8(
                        quantize_act(x, s_x),
                        expand_kernel_s2d_down(
                            self.down_conv.kernel_int8(s_w)
                        ),
                        1, ((1, 0), (1, 0)),
                    )
                    y = (
                        yq.astype(jnp.float32) * (s_x * s_w * inv) + shift
                    ).astype(self.dtype)
                else:
                    self.down_conv.observe(x)
                    y = jax.lax.conv_general_dilated(
                        x.astype(self.dtype), (w * inv).astype(self.dtype),
                        (1, 1), ((1, 0), (1, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    y = y + shift.astype(y.dtype)
                y = y * new_mask.astype(y.dtype)[..., None]
            y = nn.relu(y)
        else:
            y = conv_bn_act(self.down_conv, self.down_bn, x, new_mask, train)
        use_hpk = packed or (want_hpk and y.shape[1] % 2 == 0)
        if use_hpk and not packed:
            y = hpk_pack(y)
            pm2 = hpk_pack_mask(new_mask)  # (B, H/2, W, 2)
        use_chunk = chunk_gate(train, self.chunk_nc, self.chunk_train,
                               y.shape[2], self.chunk_min_w, y.shape[0])
        if use_chunk:
            halo = 2 * self.num_blocks
            yc = w_chunk(y, self.chunk_nc, halo)
            if use_hpk:
                pc = w_chunk(pm2, self.chunk_nc, halo)
                mc = {
                    "negc2": jnp.repeat(
                        jnp.where(pc, 0.0, _NEG), self.channels, axis=-1
                    ).astype(self.dtype),
                }
            elif train:
                mc = w_chunk(new_mask, self.chunk_nc, halo)
                stat = jnp.pad(
                    w_chunk(new_mask, self.chunk_nc, 0),
                    ((0, 0), (0, 0), (halo, halo)),
                )
                mc = (mc, stat)
            else:
                # stage-materialized channel-expanded additive re-zero mask
                # (see conv_bn_act rezero='addneg')
                mc = w_chunk(new_mask, self.chunk_nc, halo)
                mc = {
                    "m": mc,
                    "negc": jnp.repeat(
                        jnp.where(mc, 0.0, _NEG)[..., None],
                        self.channels, axis=-1,
                    ).astype(self.dtype),
                }
            for blk in self.blocks:
                yc = blk(yc, mc, train, True)
            y = w_unchunk(yc, self.chunk_nc)
        else:
            mb = new_mask
            if use_hpk:
                mb = {
                    "negc2": jnp.repeat(
                        jnp.where(pm2, 0.0, _NEG), self.channels, axis=-1
                    ).astype(self.dtype),
                }
            for blk in self.blocks:
                y = blk(y, mb, train, False)
        if use_hpk:
            y = hpk_unpack(y, self.channels)
        return y, new_mask

    def compact(self, rows_fine, nbr_down, nbr_coarse, valid_coarse,
                train: bool = True):
        """Gather-based execution: strided conv from the fine row table,
        residual blocks at the coarse level (see `compact_exec.py`)."""
        from .compact_exec import down_stage_compact

        return down_stage_compact(
            self, rows_fine, nbr_down, nbr_coarse, valid_coarse, train
        )


class DenseConvBNReLU(nn.Module):
    """Dense conv + (unmasked) BN + ReLU (`base.py:100-108` post_act_block_dense
    and the conv5 stem, `PillarResNet.py:110-117`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    momentum: float = 0.01
    eps: float = 1e-3
    dtype: Any = jnp.float32
    in_features: Optional[int] = None  # defaults to features
    quant: bool = False

    def setup(self):
        cin = self.features if self.in_features is None else self.in_features
        self.conv = MaskedConv(
            self.features, cin, self.kernel_size, self.stride,
            use_bias=False, dtype=self.dtype, quant=self.quant,
        )
        self.bn = MaskedBatchNorm(
            self.features, momentum=self.momentum, eps=self.eps,
            dtype=self.dtype,
        )

    def __call__(self, x, train: bool = True):
        return conv_bn_act(self.conv, self.bn, x, None, train)
