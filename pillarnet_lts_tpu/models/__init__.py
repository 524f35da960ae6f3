from .registry import (
    READERS,
    BACKBONES,
    NECKS,
    HEADS,
    LOSSES,
    DETECTORS,
    SECOND_STAGE,
    ROI_HEAD,
    POINT_HEAD,
)
from .builder import (
    build_reader,
    build_backbone,
    build_neck,
    build_head,
    build_detector,
    build_second_stage_module,
    build_roi_head,
    build_point_head,
)

# import submodules for registration side effects
from . import readers  # noqa: F401
from . import backbones  # noqa: F401
from . import necks  # noqa: F401
from . import bbox_heads  # noqa: F401
from . import detectors  # noqa: F401
from . import second_stage  # noqa: F401
from . import roi_heads  # noqa: F401
from . import point_heads  # noqa: F401

__all__ = [
    "READERS",
    "BACKBONES",
    "NECKS",
    "HEADS",
    "LOSSES",
    "DETECTORS",
    "SECOND_STAGE",
    "ROI_HEAD",
    "POINT_HEAD",
    "build_reader",
    "build_backbone",
    "build_neck",
    "build_head",
    "build_detector",
    "build_second_stage_module",
    "build_roi_head",
    "build_point_head",
]
