from .roi_heads import RoIMIXHead, RoIHead, RoIFFNHead
from .proposal_target_layer import proposal_target_layer, RoiTargets
from . import roi_head_template

__all__ = [
    "RoIMIXHead",
    "RoIHead",
    "RoIFFNHead",
    "proposal_target_layer",
    "RoiTargets",
    "roi_head_template",
]
