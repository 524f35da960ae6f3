"""Pretrained / finetune checkpoint loading (reference
`torchie/trainer/checkpoint.py:166-219` non-strict load +
`single_stage.py:31-38` init_weights + `pillar_rcnn.py:20-23` stage-1
bootstrap): a trained PillarNet checkpoint initializes PillarRCNN's
`single_det` subtree bitwise, and a non-strict top-level restore survives
missing/unexpected keys."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax

from pillarnet_lts_tpu.models import build_detector
from pillarnet_lts_tpu.parallel.train_state import TrainState
from pillarnet_lts_tpu.runtime.checkpoint import (
    load_pretrained,
    save_checkpoint,
)

from test_pillar_rcnn import MODEL_CFG, TEST_CFG, TRAIN_CFG


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _init_single_stage():
    cfg = dict(MODEL_CFG["first_stage_cfg"])
    model = build_detector(cfg, train_cfg=TRAIN_CFG, test_cfg=TEST_CFG)
    pts = jnp.asarray(
        np.random.RandomState(0).uniform(-15, 15, (1, 64, 5)).astype(
            np.float32)
    )
    mask = jnp.ones((1, 64), bool)
    variables = model.init(jax.random.PRNGKey(7), pts, mask, train=False)
    return model, variables, pts, mask


@pytest.mark.slow
def test_pillarnet_checkpoint_bootstraps_pillarrcnn_stage1(tmp_path):
    _, sd_vars, pts, mask = _init_single_stage()
    state = TrainState.create(sd_vars, optax.adam(1e-3))
    ckpt = save_checkpoint(str(tmp_path), state, epoch=1, meta={"epoch": 1})

    rcnn = build_detector(
        dict(MODEL_CFG), train_cfg=TRAIN_CFG, test_cfg=TEST_CFG
    )
    rc_vars = rcnn.init(
        {"params": jax.random.PRNGKey(1), "sampler": jax.random.PRNGKey(2)},
        pts, mask,
        jnp.zeros((1, 8, 10), jnp.float32),
        train=True,
    )
    rc_vars = {
        "params": jax.device_get(rc_vars["params"]),
        "batch_stats": jax.device_get(rc_vars["batch_stats"]),
    }
    before = _flatten(rc_vars)

    loaded, report = load_pretrained(rc_vars, ckpt, subtree="single_det")

    # every first-stage leaf lands bitwise (params AND BN running stats)
    src = _flatten({
        "params": jax.device_get(sd_vars["params"]),
        "batch_stats": jax.device_get(sd_vars["batch_stats"]),
    })
    after = _flatten(loaded)
    n_checked = 0
    for path, leaf in src.items():
        tgt = (path[0], "single_det") + path[1:]
        assert tgt in after, f"missing {tgt}"
        np.testing.assert_array_equal(np.asarray(after[tgt]),
                                      np.asarray(leaf))
        n_checked += 1
    assert n_checked == len(report["loaded"]) > 50

    # second-stage leaves untouched
    for path, leaf in before.items():
        if len(path) > 1 and path[1] == "single_det":
            continue
        np.testing.assert_array_equal(np.asarray(after[path]),
                                      np.asarray(leaf))
    assert not report["unexpected"] and not report["shape_mismatch"]


def test_nonstrict_top_level_finetune(tmp_path):
    _, sd_vars, _, _ = _init_single_stage()
    state = TrainState.create(sd_vars, optax.adam(1e-3))
    ckpt = save_checkpoint(str(tmp_path), state, epoch=1)

    # same architecture: full restore
    _, fresh_vars, _, _ = _init_single_stage()
    fresh = {
        "params": jax.device_get(fresh_vars["params"]),
        "batch_stats": jax.device_get(fresh_vars["batch_stats"]),
    }
    loaded, report = load_pretrained(fresh, ckpt)
    assert not report["missing"] and not report["unexpected"]
    src = _flatten(jax.device_get(sd_vars["params"]))
    dst = _flatten(loaded["params"])
    for path, leaf in src.items():
        np.testing.assert_array_equal(np.asarray(dst[path]),
                                      np.asarray(leaf))

    # architecture drift: head renamed -> those keys survive as
    # missing/unexpected, everything else still loads (strict=False parity)
    mutated = {
        "params": dict(fresh["params"]),
        "batch_stats": dict(fresh["batch_stats"]),
    }
    mutated["params"]["renamed_head"] = mutated["params"].pop("head_net")
    loaded2, report2 = load_pretrained(mutated, ckpt)
    assert any(p.startswith("params/head_net") for p in report2["unexpected"])
    assert any(
        p.startswith("params/renamed_head") for p in report2["missing"]
    )
    dst2 = _flatten(loaded2["params"])
    for path, leaf in _flatten(jax.device_get(
            sd_vars["params"]["backbone_net"])).items():
        np.testing.assert_array_equal(
            np.asarray(dst2[("backbone_net",) + path]), np.asarray(leaf)
        )
