from .registry import DATASETS, PIPELINES
from .builder import build_dataset

from . import pipelines  # noqa: F401  (registration)
from .demo import DemoDataset  # noqa: F401
from .nuscenes import NuScenesDataset  # noqa: F401
from .waymo import WaymoDataset  # noqa: F401

__all__ = [
    "DATASETS",
    "PIPELINES",
    "build_dataset",
    "DemoDataset",
    "NuScenesDataset",
    "WaymoDataset",
]
