"""Evaluation + latency CLI (reference `tools/dist_test.py`).

Usage: python tools/dist_test.py CONFIG --checkpoint CKPT [--work_dir DIR]
       [--speed_test] [--testset]

--speed_test replicates the reference protocol (`dist_test.py:110,146-157`):
batch size forced to 1, wall-clock with device sync per frame, reported over
the middle third of the set.
"""

import argparse
import json
import logging
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pillarnet_lts_tpu.apis import build_model_from_cfg, optimizer_from_cfg
from pillarnet_lts_tpu.datasets import build_dataset
from pillarnet_lts_tpu.datasets.loader import build_dataloader
from pillarnet_lts_tpu.eval_utils import detections_to_host
from pillarnet_lts_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pillarnet_lts_tpu.parallel.train_state import TrainState
from pillarnet_lts_tpu.runtime import load_checkpoint
from pillarnet_lts_tpu.utils.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description="Evaluate a detector")
    parser.add_argument("config")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--work_dir", default=None)
    parser.add_argument("--speed_test", action="store_true")
    parser.add_argument("--testset", action="store_true")
    parser.add_argument(
        "--int8", action="store_true",
        help="int8 post-training-quantized backbone (calibrates activation "
             "scales on the first 8 eval batches; see runtime/quantize.py)")
    return parser.parse_args()


def main():
    args = parse_args()

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    from pillarnet_lts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("test")
    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)

    if args.int8:
        from pillarnet_lts_tpu.runtime.quantize import enable_backbone_quant

        enable_backbone_quant(cfg.model)
    model = build_model_from_cfg(cfg)
    split = "test" if args.testset else "val"
    dataset = build_dataset(cfg.data[split])

    batch_size = 1 if args.speed_test else cfg.data["samples_per_gpu"]
    loader = build_dataloader(
        dataset,
        batch_size=batch_size,
        workers_per_gpu=cfg.data["workers_per_gpu"],
        shuffle=False,
        max_points=cfg.data.get("max_points"),
        drop_last=False,
    )

    mesh = make_mesh(1)
    # restore checkpoint into a freshly-initialized state skeleton
    first = next(iter(loader))
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(first["points"]),
        jnp.asarray(first["points_mask"]),
        train=False,
    )
    tx = optimizer_from_cfg(cfg)
    state = TrainState.create(variables, tx)
    # bare-variables checkpoints (e.g. tools/convert_torch.py output) carry
    # no optimizer state — merge them into the fresh skeleton instead
    meta_path = os.path.join(args.checkpoint, "meta.json")
    is_bare = False
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            is_bare = json.load(f).get("format") == "variables"
    if is_bare:
        from pillarnet_lts_tpu.runtime.checkpoint import load_pretrained

        merged, report = load_pretrained(variables, args.checkpoint,
                                         logger=logger)
        if report["missing"] or report["shape_mismatch"]:
            raise ValueError(
                f"checkpoint does not match {args.config}: "
                f"{len(report['missing'])} missing, "
                f"{len(report['shape_mismatch'])} shape-mismatched leaves")
        state, meta = TrainState.create(merged, tx), None
    else:
        state, meta = load_checkpoint(args.checkpoint, target_state=state)
    state = replicate(state, mesh)
    logger.info("loaded checkpoint (epoch %s)", (meta or {}).get("epoch"))

    from pillarnet_lts_tpu.eval_utils import make_infer_fn

    quant = None
    if args.int8:
        from pillarnet_lts_tpu.runtime.quantize import calibrate

        calib = []
        for j, b in enumerate(loader):
            calib.append(
                (jnp.asarray(b["points"]), jnp.asarray(b["points_mask"]))
            )
            if j >= 7:
                break
        logger.info("int8: calibrating on %d batches", len(calib))
        quant = calibrate(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            calib,
        )["quant"]

    infer = make_infer_fn(model, quant=quant)

    # double-flip TTA: the loader carries 4 flipped variants per frame
    # (identical metadata x4); predict averages them back to one row
    double_flip = bool(dict(cfg.test_cfg).get("double_flip", False))

    detections = {}
    n_batches = len(loader)
    if args.speed_test:
        # serial sync-per-frame protocol (`dist_test.py:146-157`)
        times = []
        for i, batch in enumerate(loader):
            pts = jnp.asarray(batch["points"])
            msk = jnp.asarray(batch["points_mask"])
            t0 = time.perf_counter()
            det = infer(state.params, state.batch_stats, pts, msk)
            jax.block_until_ready(det)
            times.append(time.perf_counter() - t0)
            metas = (batch["metadata"][::4] if double_flip
                     else batch["metadata"])
            for sample in detections_to_host(det, metas):
                detections[sample["metadata"]["token"]] = sample
            if i % 50 == 0:
                logger.info("batch %d/%d", i, n_batches)
        # middle-third protocol (`dist_test.py:146-157`)
        mid = times[len(times) // 3 : 2 * len(times) // 3]
        per_frame = float(np.mean(mid))
        print(f"\nTotal time per frame: {per_frame * 1000:.2f} ms "
              f"({1.0 / per_frame:.2f} FPS)")
    else:
        # pipelined eval: keep 4 batches in flight so the per-dispatch
        # round trip overlaps device compute (eval_utils.pipelined_infer;
        # ~1.3x wall-clock on the measured relay)
        from pillarnet_lts_tpu.eval_utils import pipelined_infer

        def make_args(batch):
            return (state.params, state.batch_stats,
                    jnp.asarray(batch["points"]),
                    jnp.asarray(batch["points_mask"]))

        def metas_of(batch):
            return (batch["metadata"][::4] if double_flip
                    else batch["metadata"])

        def progress(i):
            if i % 50 == 0:
                logger.info("batch %d/%d", i, n_batches)

        for det, metas in pipelined_infer(infer, loader, make_args,
                                          metas_of, on_progress=progress):
            for sample in detections_to_host(det, metas):
                detections[sample["metadata"]["token"]] = sample

    # multi-host eval: gather per-host detections before evaluation
    # (reference `torchie/trainer/utils.py:114` all_gather at
    # `dist_test.py:187-199`); identity in single-process runs
    from pillarnet_lts_tpu.parallel.dist import (
        all_gather_objects, merge_detection_dicts, process_count,
        sync_global_devices,
    )

    if process_count() > 1:
        sync_global_devices("dist_test_gather")
        detections = merge_detection_dicts(all_gather_objects(detections))
        if jax.process_index() != 0:
            return

    with open(os.path.join(work_dir, "prediction.pkl"), "wb") as f:
        pickle.dump(detections, f)

    result_dict, _ = dataset.evaluation(
        detections, output_dir=work_dir, testset=args.testset
    )
    if result_dict is not None:
        for k, v in result_dict["results"].items():
            print(f"Evaluation {k}: {v}")


if __name__ == "__main__":
    main()
