"""Every shipped config must build and trace end-to-end (eval_shape — no
compile, so full-resolution nuScenes/Waymo grids stay cheap on CPU)."""

import glob
import os
from functools import partial

import jax
import jax.numpy as jnp
import pytest

from pillarnet_lts_tpu.apis import build_model_from_cfg
from pillarnet_lts_tpu.utils.config import Config

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(glob.glob(os.path.join(ROOT, "*", "*.py")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_and_traces(path):
    cfg = Config.fromfile(path)
    model = build_model_from_cfg(cfg)

    in_ch = cfg.model.get("reader", cfg.model.get("first_stage_cfg", {}).get(
        "reader", {}))["in_channels"]
    pts = jnp.zeros((1, 256, in_ch))
    msk = jnp.ones((1, 256), bool)

    is_two_stage = cfg.model["type"] in ("PillarRCNN", "TwoStageDetector")
    if is_two_stage:
        init_fn = partial(model.init, train=False)
        vshape = jax.eval_shape(init_fn, jax.random.PRNGKey(0), pts, msk, None)

        def fwd(v, p, m):
            out = model.apply(v, p, m, None, train=False)
            return model.post_process(out)
    else:
        init_fn = partial(model.init, train=False)
        vshape = jax.eval_shape(init_fn, jax.random.PRNGKey(0), pts, msk)
        tcfg = model.processed_test_cfg()

        def fwd(v, p, m):
            preds = model.apply(v, p, m, train=False)
            return model.predict({}, preds, tcfg)

    out = jax.eval_shape(fwd, vshape, pts, msk)
    assert set(out) >= {"box3d_lidar", "scores", "label_preds", "mask"}
    B, K = out["scores"].shape
    assert B == 1 and K > 0
    assert out["box3d_lidar"].shape[:2] == (1, K)
