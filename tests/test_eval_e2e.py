"""End-to-end eval plumbing: inference -> host detections -> demo mAP."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pillarnet_lts_tpu.utils.config import Config
from pillarnet_lts_tpu.apis import build_model_from_cfg
from pillarnet_lts_tpu.datasets import build_dataset
from pillarnet_lts_tpu.datasets.loader import DataLoader
from pillarnet_lts_tpu.eval_utils import detections_to_host

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "demo",
                        "pillarnet18_demo.py")


@pytest.mark.slow
def test_eval_loop_and_demo_map(tmp_path):
    cfg = Config.fromfile(CFG_PATH)
    model = build_model_from_cfg(cfg)

    val_cfg = dict(cfg.data["train"])
    val_cfg["pipeline"] = [dict(type="Reformat")]
    val_cfg["num_frames"] = 4
    dataset = build_dataset({**val_cfg, "test_mode": True})
    loader = DataLoader(dataset, batch_size=4, shuffle=False, num_workers=1,
                        max_points=4096, drop_last=False)

    batch = next(iter(loader))
    pts = jnp.asarray(batch["points"])
    msk = jnp.asarray(batch["points_mask"])
    variables = model.init(jax.random.PRNGKey(0), pts, msk, train=False)
    test_cfg = model.processed_test_cfg()

    @jax.jit
    def infer(v, p, m):
        preds = model.apply(v, p, m, train=False)
        return model.predict({}, preds, test_cfg)

    det = infer(variables, pts, msk)
    samples = detections_to_host(det, batch["metadata"])
    assert len(samples) == 4
    detections = {s["metadata"]["token"]: s for s in samples}

    result, _ = dataset.evaluation(detections, output_dir=str(tmp_path))
    assert "demo" in result["results"]
    assert 0.0 <= result["detail"]["demo"]["mAP"] <= 1.0
