"""Training CLI (reference `tools/train.py`).

Usage: python tools/train.py CONFIG [--work_dir DIR] [--resume_from CKPT]
       [--seed N]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pillarnet_lts_tpu.apis import build_model_from_cfg, train_detector
from pillarnet_lts_tpu.datasets import build_dataset
from pillarnet_lts_tpu.utils.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description="Train a detector")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work_dir", help="dir to save logs and checkpoints")
    parser.add_argument("--resume_from", help="checkpoint to resume from")
    parser.add_argument("--seed", type=int, default=None, help="random seed")
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed for multi-host pods "
             "(the NCCL/slurm launcher equivalent, `tools/train.py:88-120`)",
    )
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    # honor an explicit platform request even under a sitecustomize that
    # force-registers a TPU plugin and overrides the env var
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    from pillarnet_lts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.multihost:
        jax.distributed.initialize()
    cfg = Config.fromfile(args.config)
    if args.work_dir is not None:
        cfg.work_dir = args.work_dir
    os.makedirs(cfg.work_dir, exist_ok=True)

    # force=True: a library import (absl/orbax) may already have configured
    # the root logger, which turns a plain basicConfig into a no-op and
    # leaves train.log empty
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(cfg.work_dir, "train.log")),
        ],
        force=True,
    )
    logger = logging.getLogger("train")

    if args.seed is not None:
        logger.info("Set random seed to %d", args.seed)
        np.random.seed(args.seed)

    # snapshot the config next to the run, as the reference does
    with open(os.path.join(cfg.work_dir, "config.py"), "w") as f:
        f.write(cfg.text)

    model = build_model_from_cfg(cfg)
    dataset = build_dataset(cfg.data["train"])
    logger.info("dataset: %d frames", len(dataset))
    train_detector(
        model, dataset, cfg, logger=logger, resume_from=args.resume_from
    )


if __name__ == "__main__":
    main()
