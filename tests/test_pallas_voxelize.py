"""Pallas voxelizer kernel vs the XLA segment-max reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from pillarnet_lts_tpu.ops.voxelize import scatter_max_to_grid
from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
    pillar_scatter_max_pallas,
)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_scatter_matches_xla(seed):
    rng = np.random.RandomState(seed)
    B, N, C = 2, 600, 8
    H, W = 16, 16
    feats = rng.randn(B, N, C).astype(np.float32)
    ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)

    want_grid, want_occ = scatter_max_to_grid(
        jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W
    )

    with pltpu.force_tpu_interpret_mode():
        got_grid, got_occ = pillar_scatter_max_pallas(
            jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W,
            tile_rows=4,
        )

    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(want_occ))
    np.testing.assert_allclose(
        np.asarray(got_grid), np.asarray(want_grid), atol=1e-6
    )


@pytest.mark.slow
def test_pallas_scatter_gradient_matches_xla():
    rng = np.random.RandomState(5)
    B, N, C = 1, 300, 8
    H = W = 16
    feats = rng.randn(B, N, C).astype(np.float32)
    ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)
    w = rng.randn(B, H, W, C).astype(np.float32)

    def loss_xla(f):
        g, _ = scatter_max_to_grid(f, jnp.array(ids_s), jnp.array(valid), H, W)
        return (g * w).sum()

    def loss_pallas(f):
        with pltpu.force_tpu_interpret_mode():
            g, _ = pillar_scatter_max_pallas(
                f, jnp.array(ids_s), jnp.array(valid), H, W, 4
            )
        return (g * w).sum()

    g_xla = np.asarray(jax.grad(loss_xla)(jnp.array(feats)))
    g_pal = np.asarray(jax.grad(loss_pallas)(jnp.array(feats)))
    np.testing.assert_allclose(g_pal, g_xla, atol=1e-6)


@pytest.mark.parametrize("tile_rows", [1, 4])
def test_mxu_scatter_matches_xla(tile_rows):
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_mxu,
    )

    rng = np.random.RandomState(2)
    B, N, C = 2, 600, 8
    H, W = 16, 16
    feats = rng.randn(B, N, C).astype(np.float32)
    ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)

    want_grid, want_occ = scatter_max_to_grid(
        jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W
    )
    with pltpu.force_tpu_interpret_mode():
        got_grid, got_occ = pillar_scatter_max_mxu(
            jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W,
            tile_rows,
        )
    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(want_occ))
    np.testing.assert_allclose(
        np.asarray(got_grid), np.asarray(want_grid), atol=1e-6
    )


def test_mxu_scatter_gradient_matches_xla():
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_mxu,
    )

    rng = np.random.RandomState(6)
    B, N, C = 1, 300, 8
    H = W = 16
    feats = rng.randn(B, N, C).astype(np.float32)
    ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)
    w = rng.randn(B, H, W, C).astype(np.float32)

    def loss_xla(f):
        g, _ = scatter_max_to_grid(f, jnp.array(ids_s), jnp.array(valid), H, W)
        return (g * w).sum()

    def loss_mxu(f):
        with pltpu.force_tpu_interpret_mode():
            g, _ = pillar_scatter_max_mxu(
                f, jnp.array(ids_s), jnp.array(valid), H, W, 4
            )
        return (g * w).sum()

    gx = jax.grad(loss_xla)(jnp.array(feats))
    gm = jax.grad(loss_mxu)(jnp.array(feats))
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gx), atol=1e-5)


def test_mxu_scatter_negative_max_across_chunks():
    """A single pillar whose (all-negative) run spans a chunk boundary: the
    first-touch-replace / later-max-combine logic must not clamp at the
    zero init."""
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_mxu,
    )

    rng = np.random.RandomState(9)
    B, N, C = 1, 600, 8
    H = W = 4
    feats = (-1.0 - np.abs(rng.randn(B, N, C))).astype(np.float32)
    ids = np.zeros((B, N), np.int32)  # everything in pillar 0
    valid = np.ones((B, N), bool)

    want_grid, want_occ = scatter_max_to_grid(
        jnp.array(feats), jnp.array(ids), jnp.array(valid), H, W
    )
    with pltpu.force_tpu_interpret_mode():
        got_grid, got_occ = pillar_scatter_max_mxu(
            jnp.array(feats), jnp.array(ids), jnp.array(valid), H, W, 1
        )
    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(want_occ))
    np.testing.assert_allclose(
        np.asarray(got_grid), np.asarray(want_grid), atol=1e-6
    )


@pytest.mark.parametrize("nonneg", [False, True])
def test_mxu_chunk_schedule_matches_xla(nonneg):
    """Chunk-parallel schedule (`_mxu_kernel_cg`): one chunk per grid step
    with output-block revisiting. Covers empty tiles (zero-init via dummy
    slots), multi-chunk tiles, and both combine paths."""
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_mxu,
        set_mxu_schedule,
    )

    rng = np.random.RandomState(7)
    B, N, C = 2, 700, 8
    H, W = 16, 16
    feats = rng.randn(B, N, C).astype(np.float32)
    if nonneg:
        feats = np.abs(feats)
    # confine ids to the top half of the grid so the lower row-band tiles
    # are EMPTY (their output must still be zero-initialized)
    ids = rng.randint(0, (H // 2) * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)

    want_grid, want_occ = scatter_max_to_grid(
        jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W
    )

    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk

    prev = vk._MXU_SCHED
    set_mxu_schedule("chunk")
    try:
        with pltpu.force_tpu_interpret_mode():
            got_grid, got_occ = pillar_scatter_max_mxu(
                jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W,
                4, nonneg,
            )
    finally:
        set_mxu_schedule(prev)

    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(want_occ))
    np.testing.assert_allclose(
        np.asarray(got_grid), np.asarray(want_grid), atol=1e-6
    )


@pytest.mark.parametrize("pack", [2, 3, 4])
def test_mxu_lane_packed_matches_xla(pack):
    """Lane-packed chunk schedule: `pack` pillars share one output row, each
    payload at lane offset (C+1)*(id % pack). Nonneg-only path. Covers
    empty tiles, multi-chunk runs straddling chunk boundaries, and rows
    receiving different lane groups from different chunks."""
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_mxu,
        set_mxu_schedule,
    )
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk

    rng = np.random.RandomState(11 + pack)
    B, N, C = 2, 1400, 8
    H, W = 24, 16  # tile_rows=3 -> tile_pillars=48, divisible by 2/3/4
    feats = np.abs(rng.randn(B, N, C)).astype(np.float32)
    ids = rng.randint(0, (H // 2) * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)

    want_grid, want_occ = scatter_max_to_grid(
        jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W
    )

    prev = vk._MXU_SCHED
    set_mxu_schedule("chunk")
    try:
        with pltpu.force_tpu_interpret_mode():
            got_grid, got_occ = pillar_scatter_max_mxu(
                jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W,
                3, True, pack,
            )
    finally:
        set_mxu_schedule(prev)

    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(want_occ))
    np.testing.assert_allclose(
        np.asarray(got_grid), np.asarray(want_grid), atol=1e-6
    )


def test_mxu_lane_packed_gradient_matches_xla():
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_mxu,
        set_mxu_schedule,
    )
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk

    rng = np.random.RandomState(13)
    B, N, C = 1, 500, 8
    H = W = 16
    feats = np.abs(rng.randn(B, N, C)).astype(np.float32)
    ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)
    w = rng.randn(B, H, W, C).astype(np.float32)

    def loss_xla(f):
        g, _ = scatter_max_to_grid(f, jnp.array(ids_s), jnp.array(valid), H, W)
        return (g * w).sum()

    def loss_packed(f):
        with pltpu.force_tpu_interpret_mode():
            g, _ = pillar_scatter_max_mxu(
                f, jnp.array(ids_s), jnp.array(valid), H, W, 4, True, 4
            )
        return (g * w).sum()

    prev = vk._MXU_SCHED
    set_mxu_schedule("chunk")
    try:
        gx = jax.grad(loss_xla)(jnp.array(feats))
        gm = jax.grad(loss_packed)(jnp.array(feats))
    finally:
        set_mxu_schedule(prev)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gx), atol=1e-5)


@pytest.mark.parametrize("dedup", ["xla", "kernel"])
@pytest.mark.parametrize("nonneg", [False, True])
def test_mxu_chunk_dedup_modes_match_xla(dedup, nonneg):
    """Both dedup placements of the chunk schedule — the round-4 XLA-side
    chunk-local segmented max (`_chunk_dedup_xla` + `_mxu_kernel_cg_pre`,
    slim payload) and the round-3 in-kernel scan — must match the XLA
    segment-max oracle, including bf16 payload streaming."""
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk

    rng = np.random.RandomState(23)
    B, N, C = 2, 900, 8
    H, W = 16, 16
    feats = rng.randn(B, N, C).astype(np.float32)
    if nonneg:
        feats = np.abs(feats)
    ids = rng.randint(0, H * W // 2, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)

    for dt in (jnp.float32, jnp.bfloat16):
        f = jnp.array(feats).astype(dt)
        want_grid, want_occ = scatter_max_to_grid(
            f, jnp.array(ids_s), jnp.array(valid), H, W
        )
        prev_s, prev_d = vk._MXU_SCHED, vk._MXU_DEDUP
        vk.set_mxu_schedule("chunk")
        vk.set_mxu_dedup(dedup)
        try:
            with pltpu.force_tpu_interpret_mode():
                got_grid, got_occ = vk.pillar_scatter_max_mxu(
                    f, jnp.array(ids_s), jnp.array(valid), H, W, 4, nonneg,
                )
        finally:
            vk.set_mxu_schedule(prev_s)
            vk.set_mxu_dedup(prev_d)
        np.testing.assert_array_equal(
            np.asarray(got_occ), np.asarray(want_occ)
        )
        np.testing.assert_array_equal(
            np.asarray(got_grid.astype(jnp.float32)),
            np.asarray(want_grid.astype(jnp.float32)),
        )


def test_mxu_int8_payload_matches_xla():
    """int8 quant-deploy payload: the MXU kernel streams nonneg int8 codes
    and must reproduce the XLA segment-max of the same codes exactly (the
    bf16 accumulator is exact for values <= 127). Covers empty tiles,
    multi-chunk tiles and cross-chunk runs."""
    from pillarnet_lts_tpu.ops.pallas.voxelize_kernel import (
        pillar_scatter_max_mxu,
    )

    rng = np.random.RandomState(11)
    B, N, C = 2, 700, 8
    H, W = 16, 16
    feats = rng.randint(0, 128, (B, N, C)).astype(np.int8)
    ids = rng.randint(0, (H // 2) * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)

    want_grid, want_occ = scatter_max_to_grid(
        jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W
    )
    assert want_grid.dtype == jnp.int8

    with pltpu.force_tpu_interpret_mode():
        got_grid, got_occ = pillar_scatter_max_mxu(
            jnp.array(feats), jnp.array(ids_s), jnp.array(valid), H, W,
            4, True,
        )
    assert got_grid.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(want_occ))
    np.testing.assert_array_equal(np.asarray(got_grid), np.asarray(want_grid))


def test_mxu_int8_requires_shipped_layout():
    from pillarnet_lts_tpu.ops.pallas import voxelize_kernel as vk

    feats = jnp.zeros((1, 64, 8), jnp.int8)
    ids = jnp.zeros((1, 64), jnp.int32)
    ok = jnp.ones((1, 64), bool)
    with pytest.raises(ValueError):
        vk.pillar_scatter_max_mxu(feats, ids, ok, 16, 16, 4, False)  # not nonneg


def test_int8_quant_commutes_with_max():
    """The exactness claim behind the int8 scatter payload: per-tensor
    monotone quantization commutes with segment max, so quantize->scatter
    equals scatter->quantize."""
    rng = np.random.RandomState(3)
    B, N, C = 1, 500, 8
    H = W = 16
    x = np.abs(rng.randn(B, N, C)).astype(np.float32)
    ids = rng.randint(0, H * W, (B, N)).astype(np.int32)
    valid = rng.rand(B, N) > 0.3
    ids_s = np.where(valid, ids, H * W).astype(np.int32)
    s = float(np.max(np.abs(x * valid[..., None]))) / 127.0

    def q(v):
        return np.clip(np.round(v / s), 0, 127).astype(np.int8)

    g_fp, occ = scatter_max_to_grid(
        jnp.array(x), jnp.array(ids_s), jnp.array(valid), H, W
    )
    g_q, occ_q = scatter_max_to_grid(
        jnp.array(q(x)), jnp.array(ids_s), jnp.array(valid), H, W
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_q))
    np.testing.assert_array_equal(q(np.asarray(g_fp)), np.asarray(g_q))
