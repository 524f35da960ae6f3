"""Dynamic pillar feature encoder (reader).

Functional equivalent of the reference `DynamicPFE`
(`det3d/models/readers/dynamic_pillar_encoder.py:29-50`) +
`PillarMaxPooling` (`det3d/ops/pillar_ops/pillar_modules.py:56-74`), fused
into one statically-shaped path:

  padded points -> per-point pillar ids + [dx_c, dy_c, raw] features
  -> shared Linear+BN+ReLU MLP (BN over valid points only, matching the
     reference BatchNorm1d over stacked points)
  -> segment-max straight into the dense (B, H, W, C) BEV grid + occupancy.

The dense grid + occupancy pair is the TPU-native stand-in for
`spconv.SparseConvTensor` handed to the backbone.
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import PillarSpec, voxelize_points
from ...ops.scatter import pillar_scatter_max
from ..registry import READERS
from ..utils.norm import MaskedBatchNorm


class _PFNDense(nn.Module):
    """Bias-free Linear for the shared per-point MLP with the following
    BN's affine foldable at eval and an int8 deploy core. Unlike the conv
    path's per-tensor activation scales, the MLP input mixes channels of
    wildly different ranges (metric coordinates ~±54 next to ~unit
    intensity/time-lag), so activations quantize per-INPUT-channel — free
    for a matmul: the channel scale folds into the weight rows
    (y = Σ_c (x_c/s_c)·(s_c·w_c)), and the rescaled weights then quantize
    per-output-channel as usual. Parameter path stays
    "pfn_dense_{k}/kernel" ((in, out), matching the previous nn.Dense)."""

    features: int
    in_features: int
    dtype: Any = jnp.float32
    quant: bool = False

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (self.in_features, self.features), jnp.float32,
        )

    def __call__(self, x):
        return x.astype(self.dtype) @ self.kernel.astype(self.dtype)

    def folded(self, x, inv, shift, mask=None):
        """matmul with the following BN folded: BN(x @ W) = x @ (W*inv) + shift.

        `mask` (bool, x.shape[:-1]): restrict the calibration absmax to
        valid rows — padded point slots carry arbitrary values that must
        not inflate the activation scales."""
        if self.quant and self.has_variable("quant", "in_absmax"):
            s_x = jnp.maximum(
                self.get_variable("quant", "in_absmax"), 1e-6
            ) / 127.0  # (Cin,) per-input-channel
            w_scaled = self.kernel * s_x[:, None]
            s_w = jnp.maximum(
                jnp.max(jnp.abs(w_scaled), axis=0) / 127.0, 1e-12
            )
            wq = jnp.clip(
                jnp.round(w_scaled * (1.0 / s_w)), -127.0, 127.0
            ).astype(jnp.int8)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * (1.0 / s_x)),
                -127.0, 127.0,
            ).astype(jnp.int8)
            yq = jax.lax.dot_general(
                xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (
                yq.astype(jnp.float32) * (s_w * inv) + shift
            ).astype(self.dtype)
        if self.quant:
            ax = jnp.abs(x)
            if mask is not None:
                ax = ax * mask[..., None].astype(ax.dtype)
            self.sow(
                "quant", "in_absmax",
                jnp.max(ax, axis=tuple(range(x.ndim - 1))
                        ).astype(jnp.float32),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.zeros((self.in_features,), jnp.float32),
            )
        y = x.astype(self.dtype) @ (
            self.kernel * inv
        ).astype(self.dtype)
        return y + shift.astype(y.dtype)


@READERS.register_module
class DynamicPFE(nn.Module):
    in_channels: int = 5
    num_filters: Sequence[int] = (32,)
    pillar_size: float = 0.1
    pc_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    dtype: Any = jnp.float32
    # > 0: emit a CompactPillars active-site row table (budget = this many
    # sites) instead of the dense grid — engages the gather-based sparse
    # conv1/conv2 path in the backbone (`backbones/compact_exec.py`), the
    # TPU recast of the reference's spconv execution. The scatter-to-dense
    # step disappears entirely in this mode.
    compact_kmax: int = 0
    # int8 deploy mode for the shared MLP (see _PFNDense)
    quant: bool = False
    # int8 scatter payload (quant deploy only): quantize the post-ReLU MLP
    # output with a calibrated per-tensor scale BEFORE the scatter, stream
    # the sorted payload / chunk DMAs as int8 (half the bytes — the last
    # named scatter lever, docs/ROADMAP.md "Scatter roofline, revised"),
    # and dequantize in the scatter's occupancy-select epilogue (fused).
    # Exact w.r.t. the int8 model's semantics: per-tensor monotone
    # quantization commutes with max, and the quantized conv1 re-quantizes
    # the grid with the same absmax-derived scale (round(q*s/s) == q).
    quant_scatter: bool = True

    @property
    def spec(self) -> PillarSpec:
        return PillarSpec(float(self.pillar_size), tuple(self.pc_range))

    @property
    def grid_shape(self) -> Tuple[int, int]:
        spec = self.spec
        return spec.height, spec.width

    @nn.compact
    def __call__(self, points, points_mask, train: bool = True):
        """points (B, N, C); points_mask (B, N) -> grid (B, H, W, F), occ (B, H, W)."""
        spec = self.spec
        feats, flat_ids, valid = voxelize_points(points, points_mask, spec)

        # shared per-point MLP: [2 + in_channels] -> num_filters
        # (reference appends 2 relative-center features,
        #  `dynamic_pillar_encoder.py:21`; MLP built at `pillar_modules.py:26-33`)
        dims = [2 + self.in_channels] + list(self.num_filters)
        x = feats.astype(self.dtype)
        for k in range(len(dims) - 1):
            dense = _PFNDense(
                dims[k + 1], dims[k], dtype=self.dtype, quant=self.quant,
                name=f"pfn_dense_{k}",
            )
            bn = MaskedBatchNorm(
                dims[k + 1], momentum=0.01, eps=1e-3, dtype=self.dtype,
                name=f"pfn_bn_{k}",
            )
            if train:
                x = bn(dense(x), mask=valid, train=True)
            else:
                # eval: BN folded into the matmul (valid-row masking is
                # irrelevant to the affine; the scatter drops invalid rows)
                inv, shift = bn.fold_factors()
                x = dense.folded(x, inv, shift, mask=valid)
            x = nn.relu(x)

        if self.compact_kmax > 0:
            import jax

            from ..backbones.compact_exec import CompactPillars
            from ...ops.compact import compact_segment_max

            hw = spec.height * spec.width
            kmax = int(self.compact_kmax)
            rows, site_ids, k_valid = jax.vmap(
                lambda f, i, v: compact_segment_max(f, i, v, hw, kmax)
            )(x, flat_ids, valid)
            return (
                CompactPillars(
                    rows=rows[:, :kmax],  # drop the per-sample sentinel row
                    site_ids=site_ids,
                    k_valid=k_valid,
                    height=spec.height,
                    width=spec.width,
                ),
                None,
            )

        if self.quant and self.quant_scatter and not train:
            if self.has_variable("quant", "scatter_absmax"):
                # deploy: int8 payload through the scatter (see field doc)
                s = jnp.maximum(
                    self.get_variable("quant", "scatter_absmax"), 1e-6
                ) / 127.0
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) * (1.0 / s)),
                    0.0, 127.0,  # post-ReLU: codes are nonneg
                ).astype(jnp.int8)
                grid_q, occ = pillar_scatter_max(
                    xq, flat_ids, valid, spec.height, spec.width,
                    nonneg=True,
                )
                # dequantize in f32 and round ONCE into the compute dtype:
                # q * bf16(s) would double-round (bf16(s) then the product),
                # pushing q*delta to ~0.5 ULP at q ~ 127 — enough for the
                # downstream conv1 re-quantization to flip a code
                grid = (
                    grid_q.astype(jnp.float32) * s
                ).astype(self.dtype)
                return grid, occ
            # calibration: the scatter input's masked absmax IS the grid
            # absmax conv1 observes (the scatter is a masked max of these
            # values), so both scales calibrate to the same number
            ax = jnp.abs(x) * valid[..., None].astype(x.dtype)
            self.sow(
                "quant", "scatter_absmax",
                jnp.max(ax).astype(jnp.float32),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.zeros((), jnp.float32),
            )

        # post-ReLU features are >= 0: engage the scatter's ungated fast path
        grid, occ = pillar_scatter_max(
            x, flat_ids, valid, spec.height, spec.width, nonneg=True
        )
        return grid, occ
