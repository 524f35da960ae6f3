"""Config -> module builders (reference `det3d/models/builder.py:17-53`).

Model modules are flax.linen dataclasses; config keys that exist purely for
the reference's imperative construction (``logger``) are dropped here.
"""

from ..utils.registry import build_from_cfg
from .registry import (
    BACKBONES,
    DETECTORS,
    HEADS,
    LOSSES,
    NECKS,
    POINT_HEAD,
    READERS,
    ROI_HEAD,
    SECOND_STAGE,
)

_NON_MODULE_KEYS = ("logger",)

_DTYPE_MAP = {
    "float32": "float32",
    "fp32": "float32",
    "bfloat16": "bfloat16",
    "bf16": "bfloat16",
}


def _clean(cfg):
    if cfg is None:
        return None
    cfg = dict(cfg)
    for k in _NON_MODULE_KEYS:
        cfg.pop(k, None)
    # configs specify compute dtype as a string; modules expect a jnp dtype
    if isinstance(cfg.get("dtype"), str):
        import jax.numpy as jnp

        cfg["dtype"] = jnp.dtype(_DTYPE_MAP[cfg["dtype"]]).type
    return cfg


def build_reader(cfg):
    return build_from_cfg(_clean(cfg), READERS)


def build_backbone(cfg):
    return build_from_cfg(_clean(cfg), BACKBONES)


def build_neck(cfg):
    return build_from_cfg(_clean(cfg), NECKS)


def build_head(cfg):
    return build_from_cfg(_clean(cfg), HEADS)


def build_loss(cfg):
    return build_from_cfg(_clean(cfg), LOSSES)


def build_second_stage_module(cfg):
    return build_from_cfg(_clean(cfg), SECOND_STAGE)


def build_roi_head(cfg):
    return build_from_cfg(_clean(cfg), ROI_HEAD)


def build_point_head(cfg):
    return build_from_cfg(_clean(cfg), POINT_HEAD)


def build_detector(cfg, train_cfg=None, test_cfg=None):
    return build_from_cfg(
        _clean(cfg), DETECTORS, dict(train_cfg=train_cfg, test_cfg=test_cfg)
    )
