"""Pillar scatter-max dispatch: Pallas tile kernel on TPU, XLA scatter
elsewhere.

Single entry point so the reader doesn't care which backend implements the
segment max (reference equivalent: `scatter_max`,
`det3d/ops/pillar_ops/scatter_utils.py:37` + `src/scatter_ops_gpu.cu:13-45`).

Backend selection: 'auto' uses the MXU one-hot-matmul kernel on TPU
backends (fastest measured: 18 ms vs 23 ms loop kernel vs 33 ms XLA for
262k points -> 1440^2 x 32) and the XLA scatter on CPU/interpret; override
with `pillarnet_lts_tpu.ops.scatter.set_backend('xla'|'pallas'|'mxu'|'sort')`.
'sort' is the scatter-free sort+segmented-scan+binary-search formulation
(`scatter_max_to_grid_sorted`) — useful on backends where XLA scatter is
slow but a Pallas kernel is unavailable.
"""

import jax

from .voxelize import scatter_max_to_grid, scatter_max_to_grid_sorted

_BACKEND = "auto"

# tile_rows passed to the MXU kernel (BEV grid rows per output tile);
# shared between the call below and the pack legality gate so they cannot
# desync. 2 is the measured optimum for the 1440^2 flagship workload.
_MXU_TILE_ROWS = 2

# lane-packing factor for the MXU kernel's nonneg path (pillars per output
# row; see voxelize_kernel._mxu_kernel_cg). Cuts the kernel's one-hot
# materialization and grid HBM traffic by `pack`x; only legal when
# pack*(C+1)+2 <= 128 lanes, so it applies to the C=32 reader output.
_MXU_PACK = 1


def set_mxu_pack(pack):
    global _MXU_PACK
    assert pack >= 1
    _MXU_PACK = pack


def set_backend(name):
    global _BACKEND
    assert name in ("auto", "xla", "pallas", "mxu", "sort")
    _BACKEND = name


def _resolve():
    if _BACKEND != "auto":
        return _BACKEND
    try:
        platform = jax.default_backend()
    except Exception:
        return "xla"
    return "mxu" if platform not in ("cpu",) else "xla"


def pillar_scatter_max(point_feats, flat_ids, valid, height, width,
                       nonneg=False):
    """(B, N, C) features + (B, N) pillar ids -> (B, H, W, C) grid, (B, H, W) occ.

    `nonneg=True` promises every valid feature is >= 0 (e.g. post-ReLU PFE
    outputs); TPU backends use a cheaper ungated max-combine for it."""
    backend = _resolve()
    if backend == "pallas":
        from .pallas.voxelize_kernel import pillar_scatter_max_pallas

        return pillar_scatter_max_pallas(
            point_feats, flat_ids, valid, height, width
        )
    if backend == "mxu":
        from .pallas import voxelize_kernel
        from .pallas.voxelize_kernel import pillar_scatter_max_mxu

        C = point_feats.shape[-1]
        tr = _MXU_TILE_ROWS
        pack = _MXU_PACK
        # lane packing is only implemented by the 'chunk' schedule, and its
        # legality depends on the actual tile size (tr * width)
        if (not nonneg or voxelize_kernel._MXU_SCHED != "chunk"
                or pack * (C + 1) + 2 > 128 or (tr * width) % pack
                or (height * width) % pack):
            pack = 1
        return pillar_scatter_max_mxu(
            point_feats, flat_ids, valid, height, width, tr, nonneg, pack
        )
    if backend == "sort":
        return scatter_max_to_grid_sorted(
            point_feats, flat_ids, valid, height, width
        )
    return scatter_max_to_grid(point_feats, flat_ids, valid, height, width)
