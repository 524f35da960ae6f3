"""Overlapped W-tiling (inference) must reproduce the plain eval forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pillarnet_lts_tpu.models.backbones.pillar_resnet import (
    PillarResNet18,
    PillarResNet34S,
)


def _inputs(seed, h=64, w=64, c=32):
    rng = np.random.RandomState(seed)
    occ = rng.rand(1, h, w) < 0.15
    grid = rng.randn(1, h, w, c).astype(np.float32) * occ[..., None]
    return jnp.asarray(grid), jnp.asarray(occ)


def _run(cls, grid, occ, **kw):
    model = cls(in_channels=grid.shape[-1], **kw)
    variables = model.init(jax.random.PRNGKey(0), grid, occ, train=False)
    # non-default running variances so BN folding is not a no-op; relative
    # perturbation (an additive DC on conv kernels compounds to overflow
    # through 20+ convs and makes the comparison meaningless)
    variables = jax.tree.map(
        lambda a: a * 1.05 if a.dtype == jnp.float32 else a, variables
    )
    out = model.apply(variables, grid, occ, train=False)
    return {k: np.asarray(v[0]) for k, v in out.items()}


def _assert_equiv(cls, s2d):
    grid, occ = _inputs(0)
    plain = _run(cls, grid, occ, s2d_stage1=s2d, chunk_nc=0)
    chunked = _run(cls, grid, occ, s2d_stage1=s2d, chunk_nc=4, chunk_min_w=16)
    assert plain.keys() == chunked.keys()
    for k in plain:
        np.testing.assert_allclose(
            chunked[k], plain[k], atol=2e-4, rtol=1e-3, err_msg=k
        )


@pytest.mark.slow
def test_chunked_equals_plain_s2d():
    _assert_equiv(PillarResNet18, s2d=True)


@pytest.mark.slow
def test_chunked_equals_plain_fine():
    _assert_equiv(PillarResNet34S, s2d=False)


def _run_train(cls, grid, occ, **kw):
    model = cls(in_channels=grid.shape[-1], **kw)
    variables = model.init(jax.random.PRNGKey(0), grid, occ, train=True)

    def loss_fn(params):
        out, updated = model.apply(
            {**variables, "params": params}, grid, occ, train=True,
            mutable=["batch_stats"],
        )
        return sum(
            jnp.abs(v[0].astype(jnp.float32)).mean() for v in out.values()
        ), updated["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    return float(loss), stats, grads



@pytest.mark.parametrize("s2d", [True, False])
@pytest.mark.slow
def test_chunked_training_matches_plain(s2d):
    """Outputs, BN batch statistics, and parameter gradients must all be
    bitwise-close between tiled and plain training execution (both the
    space-to-depth and fine conv1 paths)."""
    grid, occ = _inputs(3)
    l0, s0, g0 = _run_train(PillarResNet18, grid, occ, s2d_stage1=s2d,
                            chunk_nc=0)
    l1, s1, g1 = _run_train(
        PillarResNet18, grid, occ, s2d_stage1=s2d, chunk_nc=4,
        chunk_min_w=16, chunk_train=True,
    )
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        s1, s0,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2
        ),
        g1, g0,
    )


@pytest.mark.slow
def test_chunked_gate_requires_divisible_width():
    # W=60 is not divisible by 8: the gate must fall back to plain execution
    grid, occ = _inputs(1, h=60, w=60)
    out = _run(PillarResNet18, grid, occ, chunk_nc=8, chunk_min_w=16)
    ref = _run(PillarResNet18, grid, occ, chunk_nc=0)
    for k in out:
        np.testing.assert_allclose(out[k], ref[k], atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_chunked_gate_skips_large_batch():
    # TRAINING at batch >= 4 must skip tiling (the backward's tiled
    # activations OOM 16 GB HBM at bs=8); EVAL tiles at any batch (serving
    # graphs pay the per-conv relayout without it) and must match
    # numerically
    from pillarnet_lts_tpu.models.backbones.base import chunk_gate

    assert chunk_gate(False, 8, True, 512, 512, batch=1)
    assert chunk_gate(False, 8, True, 512, 512, batch=2)
    assert chunk_gate(False, 8, True, 512, 512, batch=4)
    assert chunk_gate(True, 8, True, 512, 512, batch=2)
    assert not chunk_gate(True, 8, True, 512, 512, batch=4)
    assert not chunk_gate(True, 8, True, 512, 512, batch=8)

    rng = np.random.RandomState(3)
    occ = rng.rand(4, 64, 64) < 0.15
    grid = rng.randn(4, 64, 64, 32).astype(np.float32) * occ[..., None]
    grid, occ = jnp.asarray(grid), jnp.asarray(occ)
    out = _run(PillarResNet18, grid, occ, chunk_nc=8, chunk_min_w=16)
    ref = _run(PillarResNet18, grid, occ, chunk_nc=0)
    for k in out:
        np.testing.assert_allclose(out[k], ref[k], atol=2e-4, rtol=1e-3)


def test_chunk_gate_eval_batch_threshold():
    """Round-5 measured gate: eval tiles below batch 8, skips at >= 8
    (bs=1 tiled 41.8 vs untiled 61.8 ms; bs=8 tiled 38.8 vs untiled 34.9 —
    tools/archive/bench_r5_tile_probe.py / bench_r5_bs8_probe.py);
    training keeps its own bs <= 2 gate (HBM-bound, round 3)."""
    from pillarnet_lts_tpu.models.backbones.base import chunk_gate

    kw = dict(chunk_nc=8, chunk_train=True, w=720, min_w=512)
    assert chunk_gate(False, batch=1, **kw)
    assert chunk_gate(False, batch=4, **kw)
    assert not chunk_gate(False, batch=8, **kw)
    assert not chunk_gate(False, batch=12, **kw)
    assert chunk_gate(True, batch=1, **kw)
    assert chunk_gate(True, batch=2, **kw)
    assert not chunk_gate(True, batch=4, **kw)
