"""Pillar R-CNN two-stage detector (stage-2 wiring).

Reference: `det3d/models/detectors/pillar_rcnn.py:9-166`. Round-1 scope:
module skeleton registering the composition; the BEV second-stage feature
extractor and RoI heads land with the second-stage milestone.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .. import builder
from ..registry import DETECTORS


@DETECTORS.register_module
class PillarRCNN(nn.Module):
    first_stage_cfg: dict
    second_stage_modules: tuple = ()
    roi_head: Optional[dict] = None
    point_head: Optional[dict] = None
    num_point: int = 1
    freeze: bool = False
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        fs = dict(self.first_stage_cfg)
        fs.pop("type", None)
        from .pillarnet import PillarNet

        self.single_det = PillarNet(
            **fs,
            train_cfg=self.train_cfg,
            test_cfg=self.test_cfg,
            dtype=self.dtype,
        )
        self.second_stage = [
            builder.build_second_stage_module({**cfg, "dtype": self.dtype})
            for cfg in self.second_stage_modules
        ]
        if self.roi_head is not None:
            self.roi_head_net = builder.build_roi_head(
                {**self.roi_head, "dtype": self.dtype}
            )
        if self.point_head is not None:
            self.point_head_net = builder.build_point_head(
                {**self.point_head, "dtype": self.dtype}
            )

    def __call__(self, points, points_mask, train: bool = True):
        raise NotImplementedError(
            "PillarRCNN stage-2 forward lands with the second-stage milestone; "
            "use PillarNet for the single-stage path."
        )
