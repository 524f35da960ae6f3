"""Pillar scatter-max dispatch: jnp (XLA scatter) today, Pallas kernel hook.

Single entry point so the reader doesn't care which backend implements the
segment max (reference equivalent: `scatter_max`,
`det3d/ops/pillar_ops/scatter_utils.py:37` + `src/scatter_ops_gpu.cu:13-45`).
"""

from .voxelize import scatter_max_to_grid

_BACKEND = "xla"


def pillar_scatter_max(point_feats, flat_ids, valid, height, width):
    """(B, N, C) features + (B, N) pillar ids -> (B, H, W, C) grid, (B, H, W) occ."""
    if _BACKEND == "xla":
        return scatter_max_to_grid(point_feats, flat_ids, valid, height, width)
    raise NotImplementedError(_BACKEND)
