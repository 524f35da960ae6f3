"""Epoch-based trainer.

Mirrors the reference Trainer's control flow
(`det3d/torchie/trainer/trainer.py:133-560`): epoch loop with hook
callbacks, per-iteration processing, resume, checkpoint meta embedding the
config text. The per-iteration body — H2D transfer, forward, loss parse,
backward, clip, step (`trainer.py:358-436` + `hooks/optimizer.py`) — is one
jitted data-parallel train step (`parallel/train_step.py`); the LR/momentum
schedule is baked into the optimizer, stepped by the global step exactly as
the reference steps `OneCycle` per iteration (`trainer.py:406-407`).
"""

import logging
import os

import jax
import numpy as np

from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..parallel.train_state import TrainState
from ..parallel.train_step import make_train_step
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .hooks import Hook
from .log_buffer import LogBuffer

_BATCH_DEVICE_KEYS = (
    "points", "points_mask", "hm", "anno_box", "ind", "mask", "cat",
    "gt_box", "gt_boxes_and_cls",
)


class Trainer:
    def __init__(
        self,
        model,
        tx,
        train_cfg,
        work_dir,
        logger=None,
        mesh=None,
        cfg_text=None,
        class_names=None,
    ):
        self.model = model
        self.tx = tx
        self.train_cfg = train_cfg
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.logger = logger or logging.getLogger("trainer")
        self.mesh = mesh or make_mesh()
        self.cfg_text = cfg_text
        self.class_names = class_names

        self.state = None
        self.epoch = 0
        self.iter = 0
        self.inner_iter = 0
        self.max_epochs = 0
        self.max_iters = 0
        self.epoch_len = 0
        self.log_buffer = LogBuffer()
        self._hooks = []
        self._train_step = None
        self._infer_fn = None

    # ---- hooks ---------------------------------------------------------------
    def register_hook(self, hook):
        assert isinstance(hook, Hook)
        self._hooks.append(hook)

    def call_hook(self, fn_name):
        for hook in self._hooks:
            getattr(hook, fn_name)(self)

    # ---- state ---------------------------------------------------------------
    def init_state(self, sample_batch, rng_seed=0):
        device_batch = self._to_device(sample_batch)
        variables = self.model.init(
            jax.random.PRNGKey(rng_seed),
            device_batch["points"],
            device_batch["points_mask"],
            train=False,
        )
        n_params = sum(
            np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"])
        )
        self.logger.info("model parameters: %.2fM", n_params / 1e6)
        state = TrainState.create(variables, self.tx)
        self.state = replicate(state, self.mesh)
        return self.state

    def _to_device(self, batch):
        device_batch = {
            k: v for k, v in batch.items() if k in _BATCH_DEVICE_KEYS
        }
        return shard_batch(device_batch, self.mesh)

    # ---- checkpointing ---------------------------------------------------------
    def save_checkpoint(self):
        meta = {
            "epoch": self.epoch + 1,
            "iter": self.iter,
            "config": self.cfg_text,
            "CLASSES": self.class_names,
        }
        path = save_checkpoint(self.work_dir, self.state, self.epoch + 1, meta)
        self.logger.info("saved checkpoint to %s", path)

    def resume(self, checkpoint_path=None):
        path = checkpoint_path or latest_checkpoint(self.work_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.work_dir}")
        state, meta = load_checkpoint(path, target_state=self.state)
        self.state = replicate(state, self.mesh)
        if meta:
            self.epoch = meta.get("epoch", 0)
            self.iter = meta.get("iter", 0)
        self.logger.info("resumed from %s (epoch %d)", path, self.epoch)

    # ---- training -------------------------------------------------------------
    def train_epoch(self, data_loader):
        if self._train_step is None:
            self._train_step = jax.jit(
                make_train_step(self.model, self.tx, self.train_cfg),
                donate_argnums=(0,),
            )
        self.epoch_len = len(data_loader)
        data_loader.set_epoch(self.epoch)
        self.call_hook("before_train_epoch")
        for i, batch in enumerate(data_loader):
            self.inner_iter = i
            self.call_hook("before_train_iter")
            device_batch = self._to_device(batch)
            self.state, metrics = self._train_step(self.state, device_batch)
            metrics = jax.device_get(metrics)
            self.log_buffer.update(
                {k: float(v) for k, v in metrics.items()}
            )
            self.call_hook("after_train_iter")
            self.iter += 1
        self.call_hook("after_train_epoch")
        self.epoch += 1

    def val(self, data_loader, dataset, output_dir=None):
        """Validation loop (`trainer.py:438-494`): run mesh-sharded inference
        over the val loader, gather per-sample detections across hosts
        (`trainer/utils.py:114` all_gather), call dataset.evaluation."""
        from ..eval_utils import detections_to_host, make_infer_fn
        from ..parallel.dist import (
            all_gather_objects,
            merge_detection_dicts,
            process_count,
            sync_global_devices,
        )

        model = self.model
        test_cfg = model.processed_test_cfg()
        # Cached on the trainer (like _train_step) so each val epoch in a
        # [('train',k),('val',1)] workflow reuses the compiled graph instead
        # of re-tracing — on backends without a compile cache that re-trace
        # costs minutes per cycle.
        if self._infer_fn is None:
            self._infer_fn = make_infer_fn(model, test_cfg)
        infer = self._infer_fn

        # pipelined: keep a few batches in flight so the per-dispatch round
        # trip overlaps device compute (eval_utils.pipelined_infer; shared
        # with tools/dist_test.py)
        from ..eval_utils import pipelined_infer

        double_flip = test_cfg.get("double_flip", False)

        def make_args(batch):
            db = self._to_device(
                {"points": batch["points"],
                 "points_mask": batch["points_mask"]}
            )
            return (self.state.params, self.state.batch_stats,
                    db["points"], db["points_mask"])

        def metas_of(batch):
            # predict collapses the 4 flip variants to B/4 rows; keep one
            # metadata entry per frame
            return (batch["metadata"][::4] if double_flip
                    else batch["metadata"])

        def progress(i):
            if i % 50 == 0:
                self.logger.info("val batch %d/%d", i, len(data_loader))

        detections = {}
        for det, metas in pipelined_infer(infer, data_loader, make_args,
                                          metas_of, on_progress=progress):
            for sample in detections_to_host(det, metas):
                detections[sample["metadata"]["token"]] = sample

        if process_count() > 1:
            sync_global_devices("val_gather")
            detections = merge_detection_dicts(all_gather_objects(detections))
            if jax.process_index() != 0:
                return detections

        out_dir = output_dir or os.path.join(self.work_dir, "eval")
        os.makedirs(out_dir, exist_ok=True)
        result, _ = dataset.evaluation(detections, output_dir=out_dir)
        if result is not None:
            for k, v in result.get("results", {}).items():
                self.logger.info("Evaluation %s: %s", k, v)
        return detections

    def run(self, data_loader, max_epochs, workflow=None, val_loader=None,
            val_dataset=None):
        """Run a (train[, val]) workflow (`trainer.py:511-560`).

        workflow: list of (mode, epochs) pairs, e.g. [('train', 5), ('val', 1)]
        — cycled until `max_epochs` *training* epochs have run, exactly like
        the reference. Default [('train', 1)] preserves the train-only loop.
        'val' entries require val_loader (+ val_dataset for metrics; defaults
        to val_loader.dataset).
        """
        workflow = list(workflow or [("train", 1)])
        for mode, _ in workflow:
            if mode not in ("train", "val"):
                raise ValueError(f"unknown workflow mode {mode!r}")
        if any(m == "val" for m, _ in workflow) and val_loader is None:
            raise ValueError("val in workflow requires val_loader")

        self.max_epochs = max_epochs
        self.max_iters = max_epochs * len(data_loader)
        self.logger.info(
            "Start running, work_dir: %s, workflow: %s, max epochs: %d",
            self.work_dir, workflow, max_epochs,
        )
        self.call_hook("before_run")
        while self.epoch < max_epochs:
            for mode, epochs in workflow:
                for _ in range(epochs):
                    if mode == "train":
                        if self.epoch >= max_epochs:
                            break
                        self.train_epoch(data_loader)
                    else:
                        self.val(
                            val_loader,
                            val_dataset or getattr(val_loader, "dataset", None),
                        )
        self.call_hook("after_run")
