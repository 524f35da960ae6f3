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

import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import PillarSpec, voxelize_points
from ...ops.scatter import pillar_scatter_max
from ..registry import READERS
from ..utils.norm import MaskedBatchNorm


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
            x = nn.Dense(
                dims[k + 1],
                use_bias=False,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_in", "normal"
                ),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"pfn_dense_{k}",
            )(x)
            x = MaskedBatchNorm(
                dims[k + 1], momentum=0.01, eps=1e-3, dtype=self.dtype,
                name=f"pfn_bn_{k}",
            )(x, mask=valid, train=train)
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

        # post-ReLU features are >= 0: engage the scatter's ungated fast path
        grid, occ = pillar_scatter_max(
            x, flat_ids, valid, spec.height, spec.width, nonneg=True
        )
        return grid, occ
