"""Trainer hook system (reference `det3d/torchie/trainer/hooks/`).

Same callback surface (`hook.py`): before_run / before_train_epoch /
before_train_iter / after_train_iter / after_train_epoch / after_run, driven
by the Trainer. The reference's OptimizerHook/LrUpdaterHook disappear — the
optimizer step and one-cycle schedule are fused into the jitted train step.
"""

import datetime
import logging
import time


class Hook:
    def before_run(self, trainer):
        pass

    def after_run(self, trainer):
        pass

    def before_train_epoch(self, trainer):
        pass

    def after_train_epoch(self, trainer):
        pass

    def before_train_iter(self, trainer):
        pass

    def after_train_iter(self, trainer):
        pass


class IterTimerHook(Hook):
    """Per-iteration wall time (`hooks/iter_timer.py`)."""

    def before_train_epoch(self, trainer):
        self.t = time.time()

    def before_train_iter(self, trainer):
        trainer.log_buffer.update({"data_time": time.time() - self.t})

    def after_train_iter(self, trainer):
        trainer.log_buffer.update({"time": time.time() - self.t})
        self.t = time.time()


class TextLoggerHook(Hook):
    """Console + json-lines logging (`hooks/logger/text.py:12-110`):
    averaged metrics printed at `interval` and appended to
    `{work_dir}/log.json` one record per log event."""

    def __init__(self, interval=10, logger=None):
        self.interval = interval
        self.logger = logger or logging.getLogger("trainer")
        self._json_path = None

    def before_run(self, trainer):
        import os

        self._json_path = os.path.join(trainer.work_dir, "log.json")

    def after_train_iter(self, trainer):
        if (trainer.inner_iter + 1) % self.interval != 0:
            return
        trainer.log_buffer.average(self.interval)
        out = trainer.log_buffer.output
        eta = ""
        if "time" in out:
            remaining = (trainer.max_iters - trainer.iter) * out["time"]
            eta = f", eta {datetime.timedelta(seconds=int(remaining))}"
        parts = ", ".join(
            f"{k}: {v:.4f}" for k, v in out.items() if k not in ("time", "data_time")
        )
        self.logger.info(
            "Epoch [%d/%d][%d/%d] time: %.3f, data: %.3f%s | %s",
            trainer.epoch + 1,
            trainer.max_epochs,
            trainer.inner_iter + 1,
            trainer.epoch_len,
            out.get("time", 0.0),
            out.get("data_time", 0.0),
            eta,
            parts,
        )
        if self._json_path is not None:
            import json

            record = dict(out)
            record.update(
                epoch=trainer.epoch + 1, iter=trainer.iter, mode="train"
            )
            with open(self._json_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        trainer.log_buffer.clear_output()


class TensorboardLoggerHook(Hook):
    """Scalar logging to TensorBoard (`hooks/logger/tensorboard.py:9`),
    via flax's SummaryWriter; no-op if tensorboard isn't installed."""

    def __init__(self, log_dir=None, interval=10):
        self.log_dir = log_dir
        self.interval = interval
        self.writer = None

    def before_run(self, trainer):
        import os

        try:
            from flax.metrics import tensorboard

            self.writer = tensorboard.SummaryWriter(
                self.log_dir or os.path.join(trainer.work_dir, "tf_logs")
            )
        except Exception:
            self.writer = None

    def after_train_iter(self, trainer):
        if self.writer is None:
            return
        if (trainer.inner_iter + 1) % self.interval != 0:
            return
        trainer.log_buffer.average(self.interval)
        for k, v in trainer.log_buffer.output.items():
            self.writer.scalar(f"train/{k}", v, trainer.iter)

    def after_run(self, trainer):
        if self.writer is not None:
            self.writer.flush()


class CheckpointHook(Hook):
    """Per-epoch checkpoint (`hooks/checkpoint.py:12-22`), process-0 only."""

    def __init__(self, interval=1):
        self.interval = interval

    def after_train_epoch(self, trainer):
        import jax

        if jax.process_index() != 0:
            return
        if (trainer.epoch + 1) % self.interval != 0:
            return
        trainer.save_checkpoint()
