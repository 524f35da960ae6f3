from .log_buffer import LogBuffer
from .hooks import (
    Hook,
    TextLoggerHook,
    TensorboardLoggerHook,
    CheckpointHook,
    IterTimerHook,
)
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from .precise_bn import recompute_batch_stats
from .trainer import Trainer

__all__ = [
    "LogBuffer",
    "Hook",
    "TextLoggerHook",
    "TensorboardLoggerHook",
    "CheckpointHook",
    "IterTimerHook",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "Trainer",
]
