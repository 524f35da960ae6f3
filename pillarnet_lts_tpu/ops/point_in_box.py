"""Point-in-rotated-box tests on device.

Equivalent of the reference `roiaware_pool3d_cuda` point kernels
(`det3d/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:328-354`), expressed
as pure broadcast math (canonical-frame test). Used by point-head target
assignment (`models/point_heads/point_head_template.py`).
"""

import jax.numpy as jnp


def points_in_rbbox_device(points, boxes):
    """points (P, 3+), boxes (N, 7) det3d (x,y,z,w,l,h,yaw) -> bool (P, N)."""
    rel = points[:, None, :3] - boxes[None, :, :3]
    ang = boxes[:, -1]
    cos_t = jnp.cos(ang)
    sin_t = jnp.sin(ang)
    lx = rel[..., 0] * cos_t - rel[..., 1] * sin_t
    ly = rel[..., 0] * sin_t + rel[..., 1] * cos_t
    lz = rel[..., 2]
    half = boxes[:, 3:6] * 0.5
    return (
        (jnp.abs(lx) <= half[None, :, 0])
        & (jnp.abs(ly) <= half[None, :, 1])
        & (jnp.abs(lz) <= half[None, :, 2])
    )
