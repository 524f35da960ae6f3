"""PillarResNet BEV backbones (masked-dense).

Stage/channel/stride layout matches the reference exactly
(`det3d/models/backbones/PillarResNet.py`):

  conv1 @ stride 1 (C),  conv2 @ 2 (2C),  conv3 @ 4 (4C),  conv4 @ 8 (8C)
  [+ dense conv5 @ 16 (8C) for the non-'S' variants, `PillarResNet.py:110-117`]

Block counts: 18 -> (2, 2, 2, 2) + conv5(1+2 dense); 34 -> (3, 4, 6, 3).
Returns a dict {'conv1'...'conv5'} of (features, occupancy-mask) pairs;
conv5 carries mask None (it is dense, reference `.dense()` at
`PillarResNet.py:139`).
"""

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops.compact import (
    compact_to_dense,
    down_conv_neighbor_table,
    downsample_site_ids,
    subm_neighbor_table,
)
from ..registry import BACKBONES
from .base import (
    DenseConvBNReLU,
    chunk_gate,
    pallas_s2d_gate,
    remat_policy,
    Sparse2DBasicBlock,
    Sparse2DBasicBlockV,
    SparseDownStage,
    s2d_fused_stage,
    s2d_pack,
    s2d_pack_mask,
    s2d_unpack,
    w_chunk,
    w_unchunk,
)
from .compact_exec import (
    CompactPillars,
    basic_block_compact,
    basic_block_v_compact,
    down_stage_compact,
)


class _PillarResNetBase(nn.Module):
    in_channels: int = 32
    dtype: Any = jnp.float32

    # subclass config
    conv1_blocks: int = 2  # total blocks in conv1 (first is the V block)
    stage_blocks: Tuple[int, int, int] = (2, 2, 2)  # conv2..conv4
    with_conv5: bool = False
    # run the stride-1 stage (and the conv2 downsample) in space-to-depth
    # layout — numerically equivalent, ~3.5x faster on the MXU at 32
    # channels (see base.py). Parameters are identical either way.
    s2d_stage1: bool = True
    # overlapped W-tiling of the wide stride-1 stages (conv1 + conv2
    # residual blocks): keeps XLA's space-to-batch conv form for a whole
    # stage instead of paying a relayout round trip per conv (see base.py
    # w_chunk). 0 disables. Exact numerics either way; chunk_train extends
    # the tiling to the training graph (BN stats exclude halo duplicates).
    chunk_nc: int = 8
    chunk_min_w: int = 512
    chunk_train: bool = True
    # eval-only H-pack of the 64-channel stage's residual blocks
    # ((B, H, W, 64) -> (B, H/2, W, 128), see base.py conv_bn_act_hpk):
    # full MXU lane utilization + halved physical activation bytes for
    # exact numerics. Engages only where 2*channels <= 128, so passing it
    # to every down stage is safe (conv3/conv4 ignore it). Default ON from
    # the in-model A/B (tools/bench_r4_hpack_model_probe.py, 3 interleaved
    # rounds): full-graph on-chip p50 bf16 ~56-60 -> ~52-55 ms, int8
    # ~48-51 -> ~45-47 ms.
    hpack: bool = True
    # compact (gather-based) execution of conv1 + conv2 — engaged when the
    # reader hands a CompactPillars table instead of a dense grid (reader
    # knob: `compact_kmax`). Budget for the conv2 active-site table;
    # 0 = 5/8 of the reader budget.
    compact_kmax2: int = 0
    # activation-checkpoint (nn.remat / jax.checkpoint) every residual
    # block and down stage: the backward replays each block's forward
    # instead of storing its intermediate activations. Unlocks large-batch
    # training (bs=8 on one 16 GB chip OOMs without it) at ~1.3x backward
    # FLOPs. Parameter tree is unchanged — checkpoints stay compatible.
    remat: bool = False
    # checkpoint policy under `remat`: None replays the whole block in the
    # backward; 'conv_out' keeps conv results resident and replays only the
    # elementwise tail (trades block-boundary memory for conv recompute).
    remat_policy: str = None
    # int8 deploy mode for the backbone convs (eval only; see base.py module
    # comment and runtime/quantize.py). Checkpoints are unchanged — the
    # calibrated activation scales live in a separate 'quant' collection.
    quant: bool = False
    # int8 eval of the UNTILED stride-1 stage as ONE fused Pallas kernel
    # (ops/pallas/s2d_conv_kernel.py::s2d_stage_int8): all 5/7 SubM convs
    # band-resident in VMEM — one HBM read + one write for the whole stage
    # — on phase-aligned int8 taps (16/9 of the fine conv's MXU FLOPs
    # instead of the s2d expansion's structural 4x). Engages only where
    # pallas_s2d_gate allows (int8 eval, untiled, 128 lanes, all convs
    # calibrated) — everywhere else this flag is inert.
    s2d_pallas: bool = False

    @property
    def backbone_channels(self):
        c = self.in_channels
        out = {"conv1": c, "conv2": c * 2, "conv3": c * 4, "conv4": c * 8}
        if self.with_conv5:
            out["conv5"] = c * 8
        return out

    @property
    def backbone_strides(self):
        out = {"conv1": 1, "conv2": 2, "conv3": 4, "conv4": 8}
        if self.with_conv5:
            out["conv5"] = 16
        return out

    @nn.compact
    def __call__(self, grid, occ, train: bool = True) -> Dict[str, tuple]:
        if isinstance(grid, CompactPillars):
            return self._forward_compact(grid, train)
        c = self.in_channels
        use_s2d = (
            self.s2d_stage1
            and grid.shape[1] % 2 == 0
            and grid.shape[2] % 2 == 0
        )

        if use_s2d:
            x = s2d_pack(grid)
            m4 = s2d_pack_mask(occ)
        else:
            x, occ4 = grid, occ

        use_chunk = chunk_gate(train, self.chunk_nc, self.chunk_train,
                               x.shape[2], self.chunk_min_w, x.shape[0])
        if use_chunk:
            nc = self.chunk_nc
            halo = 3 + 2 * (self.conv1_blocks - 1)  # convs in stage 1
            x = w_chunk(x, nc, halo)
            if use_s2d:
                m4c = w_chunk(m4, nc, halo)
                occ4 = {"mask4": m4c}
                if train:
                    occ4["stat4"] = jnp.pad(
                        w_chunk(m4, nc, 0),
                        ((0, 0), (0, 0), (halo, halo), (0, 0)),
                    )
                else:
                    occ4["maskc"] = jnp.repeat(
                        m4c, c, axis=-1).astype(self.dtype)
                    occ4["negc"] = jnp.repeat(
                        jnp.where(m4c, 0.0, -jnp.inf), c, axis=-1
                    ).astype(self.dtype)
            else:
                occ4 = w_chunk(occ4, nc, halo)
                if train:
                    stat = jnp.pad(
                        w_chunk(occ, nc, 0),
                        ((0, 0), (0, 0), (halo, halo)),
                    )
                    occ4 = (occ4, stat)
        elif use_s2d:
            occ4 = {"mask4": m4}
            if not train:
                # channel-expanded re-zero masks, materialized once for the
                # whole stage (per-conv repeats defeat conv-epilogue fusion)
                occ4["maskc"] = jnp.repeat(m4, c, axis=-1).astype(self.dtype)
                occ4["negc"] = jnp.repeat(
                    jnp.where(m4, 0.0, -jnp.inf), c, axis=-1
                ).astype(self.dtype)

        BlockV, Block, Down = (
            Sparse2DBasicBlockV, Sparse2DBasicBlock, SparseDownStage
        )
        if self.remat:
            # flax nn.remat argnums count `self` as 0, and only positional
            # call args can be static: (self, x, mask, train, chunked)
            pol = remat_policy(self.remat_policy)
            BlockV = nn.remat(Sparse2DBasicBlockV, static_argnums=(3, 4),
                              policy=pol)
            Block = nn.remat(Sparse2DBasicBlock, static_argnums=(3, 4),
                             policy=pol)
            Down = nn.remat(SparseDownStage, static_argnums=(3,),
                            policy=pol)

        blocks = [
            BlockV(
                c, dtype=self.dtype, s2d=use_s2d, quant=self.quant,
                name="conv1_block0",
            )
        ] + [
            Block(
                c, dtype=self.dtype, s2d=use_s2d, quant=self.quant,
                name=f"conv1_block{i}",
            )
            for i in range(1, self.conv1_blocks)
        ]
        fused = None
        if use_s2d and pallas_s2d_gate(self.s2d_pallas, train, use_chunk, c):
            # fused Pallas stage (int8 eval, untiled): every conv of every
            # block must be calibrated, else fall back to the XLA path
            fused = []
            for blk in blocks:
                p = blk.s2d_fused_convs()
                if p is None:
                    fused = None
                    break
                fused.extend(p)
        if fused is not None:
            x = s2d_fused_stage(x, fused, occ4["maskc"])
        else:
            for blk in blocks:
                x = blk(x, occ4, train, use_chunk)
        if use_chunk:
            x = w_unchunk(x, self.chunk_nc)
        # fine-layout stage-1 output for consumers of the dict entry; dead
        # code (eliminated by XLA) when nothing reads backbone['conv1']
        x1 = s2d_unpack(x, c) if use_s2d else x
        m1 = occ

        x2, m2 = Down(
            c * 2, self.stage_blocks[0], in_channels=c, dtype=self.dtype,
            s2d_in=use_s2d, chunk_nc=self.chunk_nc,
            chunk_min_w=self.chunk_min_w, chunk_train=self.chunk_train,
            remat=self.remat, remat_policy=self.remat_policy,
            quant=self.quant, hpack=self.hpack, name="conv2",
        )(x, m1, train)
        x3, m3 = Down(
            c * 4, self.stage_blocks[1], in_channels=c * 2, dtype=self.dtype,
            chunk_nc=self.chunk_nc, chunk_min_w=self.chunk_min_w,
            chunk_train=self.chunk_train, remat=self.remat,
            remat_policy=self.remat_policy, quant=self.quant, hpack=self.hpack, name="conv3",
        )(x2, m2, train)
        x4, m4 = Down(
            c * 8, self.stage_blocks[2], in_channels=c * 4, dtype=self.dtype,
            chunk_nc=self.chunk_nc, chunk_min_w=self.chunk_min_w,
            chunk_train=self.chunk_train, remat=self.remat,
            remat_policy=self.remat_policy, quant=self.quant, hpack=self.hpack, name="conv4",
        )(x3, m3, train)

        out = {
            "conv1": (x1, m1),
            "conv2": (x2, m2),
            "conv3": (x3, m3),
            "conv4": (x4, m4),
        }

        if self.with_conv5:
            out["conv5"] = (self._conv5(x4, train), None)

        return out

    def _conv5(self, x4, train):
        """Dense stride-16 stage (`PillarResNet.py:110-117`)."""
        c = self.in_channels
        Dense = (nn.remat(DenseConvBNReLU, static_argnums=(2,),
                          policy=remat_policy(self.remat_policy))
                 if self.remat else DenseConvBNReLU)
        y = Dense(
            c * 8, kernel_size=3, stride=2, dtype=self.dtype,
            quant=self.quant, name="conv5_down",
        )(x4, train)
        y = Dense(
            c * 8, kernel_size=3, stride=1, dtype=self.dtype,
            quant=self.quant, name="conv5_block0",
        )(y, train)
        y = Dense(
            c * 8, kernel_size=3, stride=1, dtype=self.dtype,
            quant=self.quant, name="conv5_block1",
        )(y, train)
        return y

    def _forward_compact(self, cp: CompactPillars, train: bool):
        """conv1 + conv2 over the compact active-site table (gather convs),
        densify at the conv2 output (stride 2) where occupancy is high
        enough that the dense MXU path wins, conv3+ as usual.

        Equivalent of the reference's actual sparse execution
        (`PillarResNet.py:73-108` over spconv tensors); numerics equal to
        the masked-dense path (tested in test_compact_backbone.py).
        """
        import jax

        if self.quant:
            raise NotImplementedError(
                "the int8 deploy path requires the dense reader "
                "(reader.compact_kmax=0); the compact gather execution "
                "reads conv kernels directly and would silently run "
                "full-precision"
            )
        c = self.in_channels
        H, W = cp.height, cp.width
        kmax = cp.site_ids.shape[1]
        k2max = self.compact_kmax2 or max(8, (kmax * 5 // 8 + 7) // 8 * 8)

        slot = jnp.arange(kmax, dtype=jnp.int32)
        valid1 = slot[None, :] < cp.k_valid[:, None]
        nbr1 = jax.vmap(
            lambda s, k: subm_neighbor_table(s, k, H, W, kmax)
        )(cp.site_ids, cp.k_valid)

        x = Sparse2DBasicBlockV(
            c, dtype=self.dtype, name="conv1_block0"
        ).compact(cp.rows, nbr1, valid1, train)
        for i in range(1, self.conv1_blocks):
            x = Sparse2DBasicBlock(
                c, dtype=self.dtype, name=f"conv1_block{i}"
            ).compact(x, nbr1, valid1, train)

        # conv2 tables: dilated coarse sites + strided/SubM gather indices
        H2, W2 = H // 2, W // 2
        ids2, k2 = jax.vmap(
            lambda s, k: downsample_site_ids(s, k, H, W, k2max)
        )(cp.site_ids, cp.k_valid)
        nbr_down = jax.vmap(
            lambda s2, kk2, s1, kk1: down_conv_neighbor_table(
                s2, kk2, s1, kk1, H, W, kmax
            )
        )(ids2, k2, cp.site_ids, cp.k_valid)
        nbr2 = jax.vmap(
            lambda s, k: subm_neighbor_table(s, k, H2, W2, k2max)
        )(ids2, k2)
        valid2 = jnp.arange(k2max, dtype=jnp.int32)[None, :] < k2[:, None]

        x2c = SparseDownStage(
            c * 2, self.stage_blocks[0], in_channels=c, dtype=self.dtype,
            name="conv2",
        ).compact(x, nbr_down, nbr2, valid2, train)

        # densify: conv3+ occupancy is high enough that dense wins
        x2, m2 = jax.vmap(
            lambda r, s, k: compact_to_dense(r, s, k, H2, W2)
        )(jnp.pad(x2c, ((0, 0), (0, 1), (0, 0))), ids2, k2)
        x2 = x2.astype(self.dtype)

        x1_dense, m1 = jax.vmap(
            lambda r, s, k: compact_to_dense(r, s, k, H, W)
        )(jnp.pad(x, ((0, 0), (0, 1), (0, 0))), cp.site_ids, cp.k_valid)

        x3, m3 = SparseDownStage(
            c * 4, self.stage_blocks[1], in_channels=c * 2, dtype=self.dtype,
            chunk_nc=self.chunk_nc, chunk_min_w=self.chunk_min_w,
            chunk_train=self.chunk_train, remat=self.remat, name="conv3",
        )(x2, m2, train)
        x4, m4 = SparseDownStage(
            c * 8, self.stage_blocks[2], in_channels=c * 4, dtype=self.dtype,
            chunk_nc=self.chunk_nc, chunk_min_w=self.chunk_min_w,
            chunk_train=self.chunk_train, remat=self.remat, name="conv4",
        )(x3, m3, train)

        out = {
            "conv1": (x1_dense.astype(self.dtype), m1),
            "conv2": (x2, m2),
            "conv3": (x3, m3),
            "conv4": (x4, m4),
        }
        if self.with_conv5:
            out["conv5"] = (self._conv5(x4, train), None)
        return out


@BACKBONES.register_module
class PillarResNet18S(_PillarResNetBase):
    conv1_blocks: int = 2
    stage_blocks: Tuple[int, int, int] = (2, 2, 2)
    with_conv5: bool = False


@BACKBONES.register_module
class PillarResNet18(_PillarResNetBase):
    conv1_blocks: int = 2
    stage_blocks: Tuple[int, int, int] = (2, 2, 2)
    with_conv5: bool = True


@BACKBONES.register_module
class PillarResNet34S(_PillarResNetBase):
    conv1_blocks: int = 3
    stage_blocks: Tuple[int, int, int] = (4, 6, 3)
    with_conv5: bool = False


@BACKBONES.register_module
class PillarResNet34(_PillarResNetBase):
    conv1_blocks: int = 3
    stage_blocks: Tuple[int, int, int] = (4, 6, 3)
    with_conv5: bool = True
