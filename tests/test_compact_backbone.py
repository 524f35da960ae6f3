"""Compact (gather) backbone execution == masked-dense execution.

Same parameters, same inputs: the full PillarResNet forward must agree
between the dense-grid path and the CompactPillars path in BOTH eval and
train modes (including BN batch-statistics updates), since compact mode is
a pure execution-layout choice (`backbones/compact_exec.py`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pillarnet_lts_tpu.models.backbones.pillar_resnet import PillarResNet18S
from pillarnet_lts_tpu.models.backbones.compact_exec import CompactPillars
from pillarnet_lts_tpu.ops.compact import compact_segment_max
from pillarnet_lts_tpu.ops.voxelize import scatter_max_to_grid

H = W = 32
C = 8
KMAX = 160


def _scene(seed, B=2, N=300):
    rng = np.random.RandomState(seed)
    n_sites = 60
    feats = rng.randn(B, N, C).astype(np.float32)
    ids = np.zeros((B, N), np.int32)
    valid = rng.rand(B, N) > 0.1
    for b in range(B):
        sites = rng.choice(H * W, n_sites, replace=False)
        ids[b] = sites[rng.randint(0, n_sites, N)]
    ids = np.where(valid, ids, H * W).astype(np.int32)
    return jnp.array(feats), jnp.array(ids), jnp.array(valid)


def _both_inputs(seed):
    feats, ids, valid = _scene(seed)
    grid, occ = scatter_max_to_grid(feats, ids, valid, H, W)
    rows, site_ids, k = jax.vmap(
        lambda f, i, v: compact_segment_max(f, i, v, H * W, KMAX)
    )(feats, ids, valid)
    cp = CompactPillars(
        rows=rows[:, :KMAX], site_ids=site_ids, k_valid=k, height=H, width=W
    )
    return (grid, occ), cp


def _model():
    # s2d / chunking off so the dense reference path is the plain one
    return PillarResNet18S(
        in_channels=C, s2d_stage1=False, chunk_nc=0, compact_kmax2=256
    )


def _assert_stage_equal(dense_out, compact_out, atol):
    for key in dense_out:
        xd, md = dense_out[key]
        xc, mc = compact_out[key]
        if md is not None:
            np.testing.assert_array_equal(
                np.asarray(md), np.asarray(mc), err_msg=key
            )
        np.testing.assert_allclose(
            np.asarray(xd), np.asarray(xc), atol=atol, err_msg=key
        )


@pytest.mark.slow
def test_compact_backbone_matches_dense_eval():
    model = _model()
    (grid, occ), cp = _both_inputs(0)
    variables = model.init(jax.random.PRNGKey(0), grid, occ, train=False)
    dense_out = model.apply(variables, grid, occ, train=False)
    compact_out = model.apply(variables, cp, None, train=False)
    _assert_stage_equal(dense_out, compact_out, atol=2e-4)


def test_compact_backbone_matches_dense_train_and_stats():
    model = _model()
    (grid, occ), cp = _both_inputs(1)
    variables = model.init(jax.random.PRNGKey(0), grid, occ, train=False)
    dense_out, dmut = model.apply(
        variables, grid, occ, train=True, mutable=["batch_stats"]
    )
    compact_out, cmut = model.apply(
        variables, cp, None, train=True, mutable=["batch_stats"]
    )
    _assert_stage_equal(dense_out, compact_out, atol=2e-4)
    jax.tree_util.tree_map(
        lambda vd, vc: np.testing.assert_allclose(
            np.asarray(vd), np.asarray(vc), atol=2e-4
        ),
        dmut["batch_stats"], cmut["batch_stats"],
    )


@pytest.mark.slow
def test_compact_backbone_gradients_match_dense():
    """d loss / d params must agree between execution layouts (the compact
    path trains through jnp.take VJPs)."""
    model = _model()
    (grid, occ), cp = _both_inputs(2)
    variables = model.init(jax.random.PRNGKey(0), grid, occ, train=False)

    def loss_dense(params):
        out, _ = model.apply(
            {"params": params}, grid, occ, train=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.sum(x * x) for x, _ in out.values())

    def loss_compact(params):
        out, _ = model.apply(
            {"params": params}, cp, None, train=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.sum(x * x) for x, _ in out.values())

    gd = jax.grad(loss_dense)(variables["params"])
    gc = jax.grad(loss_compact)(variables["params"])
    jax.tree_util.tree_map(
        lambda vd, vc: np.testing.assert_allclose(
            np.asarray(vd), np.asarray(vc), rtol=2e-3, atol=2e-3
        ),
        gd, gc,
    )


@pytest.mark.slow
def test_full_detector_compact_equals_dense():
    """End-to-end PillarNet forward + predict: compact reader/backbone path
    must reproduce the dense path's detections on the demo config."""
    import os
    from pillarnet_lts_tpu.utils.config import Config
    from pillarnet_lts_tpu.apis import build_model_from_cfg

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "demo",
        "pillarnet18_demo.py",
    )
    cfg = Config.fromfile(cfg_path)
    rng = np.random.RandomState(0)
    B, N = 2, 1024
    pts = np.zeros((B, N, 5), np.float32)
    pts[..., 0] = rng.uniform(-15, 15, (B, N))
    pts[..., 1] = rng.uniform(-15, 15, (B, N))
    pts[..., 2] = rng.uniform(-2, 1, (B, N))
    pts[..., 3] = rng.uniform(0, 255, (B, N))
    msk = rng.rand(B, N) > 0.05
    pts_j, msk_j = jnp.asarray(pts), jnp.asarray(msk)

    dense_model = build_model_from_cfg(cfg)
    cfg.model["reader"]["compact_kmax"] = 1024
    compact_model = build_model_from_cfg(cfg)

    variables = dense_model.init(jax.random.PRNGKey(0), pts_j, msk_j,
                                 train=False)
    test_cfg = dense_model.processed_test_cfg()
    pd = dense_model.apply(variables, pts_j, msk_j, train=False)
    pc = compact_model.apply(variables, pts_j, msk_j, train=False)
    dd = dense_model.predict({}, pd, test_cfg)
    dc = compact_model.predict({}, pc, test_cfg)
    np.testing.assert_array_equal(np.asarray(dd["mask"]), np.asarray(dc["mask"]))
    m = np.asarray(dd["mask"]).astype(bool)
    np.testing.assert_allclose(
        np.asarray(dd["box3d_lidar"])[m], np.asarray(dc["box3d_lidar"])[m],
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(dd["scores"])[m], np.asarray(dc["scores"])[m], atol=1e-3
    )
