"""End-to-end training slice on the synthetic dataset (CPU, 8 virtual devices)."""

import os
import glob

import numpy as np
import pytest

from pillarnet_lts_tpu.utils.config import Config
from pillarnet_lts_tpu.apis import build_model_from_cfg, train_detector
from pillarnet_lts_tpu.datasets import build_dataset

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "demo",
                        "pillarnet18_demo.py")


@pytest.mark.slow
def test_train_one_epoch(tmp_path):
    cfg = Config.fromfile(CFG_PATH)
    cfg.work_dir = str(tmp_path / "work")
    dataset = build_dataset(cfg.data["train"])
    assert len(dataset) == 8

    # pipeline output sanity
    example = dataset[0]
    assert "points" in example and "hm" in example
    assert example["hm"][0].shape[-1] == 1

    model = build_model_from_cfg(cfg)
    trainer = train_detector(model, dataset, cfg)

    # loss moved and is finite
    assert trainer.iter == 1  # 8 frames / batch 8
    losses = trainer.log_buffer.val_history["loss"]
    assert all(np.isfinite(l) for l in losses)

    # checkpoint written with meta
    ckpts = glob.glob(os.path.join(cfg.work_dir, "epoch_*"))
    assert len(ckpts) == 1
    assert os.path.exists(os.path.join(cfg.work_dir, "latest"))

    # resume restores state
    trainer2 = Trainer_resume_roundtrip(cfg, model, dataset)
    assert trainer2 is not None


def Trainer_resume_roundtrip(cfg, model, dataset):
    from pillarnet_lts_tpu.datasets.loader import build_dataloader
    from pillarnet_lts_tpu.runtime import Trainer
    from pillarnet_lts_tpu.solver import build_optimizer

    loader = build_dataloader(
        dataset, batch_size=8, workers_per_gpu=1, shuffle=False,
        max_points=cfg.data["max_points"],
    )
    tx = build_optimizer(cfg.optimizer, cfg.lr_config, 10, 35.0)
    tr = Trainer(model, tx, dict(cfg.train_cfg), cfg.work_dir)
    tr.init_state(next(iter(loader)))
    tr.resume()
    assert tr.epoch == 1
    return tr
