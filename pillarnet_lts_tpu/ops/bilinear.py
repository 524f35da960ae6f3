"""Bilinear interpolation of BEV feature maps at continuous coordinates.

Equivalent of `bilinear_interpolate_torch` (`det3d/core/utils/center_utils.py:91-120`),
vectorized over query points (used by the second-stage RoI grid pooling,
`models/second_stage/bev_interpolation.py`).
"""

import jax.numpy as jnp


def bilinear_interpolate(im, x, y):
    """im: (H, W, C); x, y: (N,) continuous pixel coords -> (N, C)."""
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = x0 + 1
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = y0 + 1

    H, W = im.shape[0], im.shape[1]
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    Ia = im[y0c, x0c]
    Ib = im[y1c, x0c]
    Ic = im[y0c, x1c]
    Id = im[y1c, x1c]

    # weights use the *unclamped* neighbor positions, matching the reference
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (
        Ia * wa[:, None] + Ib * wb[:, None] + Ic * wc[:, None] + Id * wd[:, None]
    )
