"""Legacy detector classes kept for config-zoo compatibility.

The reference retains two CenterPoint-era detectors that its live configs no
longer exercise but that its registry still exposes:

- ``VoxelNet`` (`det3d/models/detectors/voxelnet.py:6-40`): the generic
  reader -> backbone -> neck -> head single-stage detector. In this framework
  that flow *is* ``PillarNet``, so ``VoxelNet`` is a registered alias.
- ``TwoStageDetector`` (`det3d/models/detectors/two_stage.py:10-194`): a
  two-stage detector whose second stage pools BEV features at box *centers*
  (``num_point`` in {1, 5}: center, or center + the four edge midpoints,
  `two_stage.py:52-80`) via bilinear interpolation, instead of Pillar R-CNN's
  RoI-grid pooling. Re-expressed here as a ``PillarRCNN`` subclass that
  overrides only the second-stage pooling hook; target sampling, RoI head,
  loss combination (`two_stage.py:44-50`) and sqrt(iou*score) post-processing
  (`two_stage.py:120-150`) are shared with Pillar R-CNN, which matches the
  reference (both inherit the same RoI-head template).

``use_final_feature`` (pooling from the head's shared-conv map rather than
the neck output, `two_stage.py:164-167`) is not supported — no reference
config sets it — and raises at construction.
"""

import jax.numpy as jnp
from flax import linen as nn

from .. import builder
from ..registry import DETECTORS
from .pillar_rcnn import PillarRCNN
from .pillarnet import PillarNet


@DETECTORS.register_module
class VoxelNet(PillarNet):
    """Generic single-stage detector (`voxelnet.py:6-40`); identical flow."""


def box_center_points(rois, num_point):
    """Query points for box-center BEV pooling (`two_stage.py:52-80`).

    rois: (B, K, C) with [x, y, z, w, l, h, rot, ...] (rotation at slot 6 —
    the post-reorder layout). Returns (B, num_point*K, 2) ordered
    [centers; front; back; left; right] to match the reference's
    concatenation order, which the extractor's section regrouping relies on.
    """
    centers = rois[..., :2]
    if num_point == 1:
        return centers
    if num_point != 5:
        raise NotImplementedError(f"num_point={num_point} (reference: 1 or 5)")
    w = rois[..., 3:4]
    l = rois[..., 4:5]
    rot = rois[..., 6]
    c, s = jnp.cos(rot)[..., None], jnp.sin(rot)[..., None]
    zeros = jnp.zeros_like(w)
    # midpoints of the 4 box edges in canonical frame, then rotate with
    # p @ [[cos, -sin], [sin, cos]] — box_np_ops.rotation_2d's convention
    offs = [
        jnp.concatenate([-w / 2, zeros], -1),  # front = (c0+c1)/2
        jnp.concatenate([w / 2, zeros], -1),   # back
        jnp.concatenate([zeros, -l / 2], -1),  # left
        jnp.concatenate([zeros, l / 2], -1),   # right
    ]
    pts = [centers]
    for o in offs:
        rx = o[..., 0] * c[..., 0] + o[..., 1] * s[..., 0]
        ry = -o[..., 0] * s[..., 0] + o[..., 1] * c[..., 0]
        pts.append(centers + jnp.stack([rx, ry], axis=-1))
    return jnp.concatenate(pts, axis=1)


@DETECTORS.register_module
class TwoStageDetector(PillarRCNN):
    """Legacy box-center-pooling two-stage detector (`two_stage.py:10-194`)."""

    def setup(self):
        if self.use_final_feature:
            raise NotImplementedError(
                "use_final_feature is unused by every reference config"
            )
        fs = dict(self.first_stage_cfg)
        fs.pop("type", None)
        self.single_det = PillarNet(
            **fs, train_cfg=self.train_cfg, test_cfg=self.test_cfg,
            dtype=self.dtype,
        )
        # box-center extractors take no backbone geometry, unlike the
        # RoI-grid modules PillarRCNN.setup feeds channel/stride info
        self.second_stage = [
            builder.build_second_stage_module({**dict(m), "dtype": self.dtype})
            for m in self.second_stage_modules
        ]
        if self.roi_head is not None:
            self.roi_head_net = builder.build_roi_head(
                {**dict(self.roi_head), "dtype": self.dtype}
            )
        if self.point_head is not None:
            raise NotImplementedError(
                "point_head is unused with the legacy TwoStageDetector"
            )

    def _pool_second_stage(self, bev, feats, rois_used, train):
        centers = box_center_points(rois_used, self.num_point)
        bev_feature = bev[-1]
        roi_feats = None
        for module in self.second_stage:
            roi_feats = module(bev_feature, centers, train)
        return roi_feats, None, None
