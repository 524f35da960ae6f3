"""Second-stage BEV feature extraction (RoI-grid bilinear pooling).

Re-implementation of `BEVStrideFeature`
(`det3d/models/second_stage/bev_interpolation.py:162-308`): fuse the neck
output with lateral backbone features at `out_stride`, generate a
grid_size x grid_size rotated grid of points per RoI
(`center_to_grid_box2d`, `core/bbox/box_torch_ops.py:220-251`), and
bilinear-interpolate per-point features. The reference's per-sample python
loop (`:259-265`) becomes a vmap; pure gather math — natively TPU-friendly.
"""

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.bilinear import bilinear_interpolate
from ..registry import SECOND_STAGE
from ..utils.norm import MaskedBatchNorm

_XAVIER = nn.initializers.xavier_uniform()


def roi_grid_points(rois, grid_size):
    """(..., 7+) rois -> (..., grid^2, 2) rotated BEV grid points.

    Port of `center_to_grid_box2d` + `get_dense_roi_grid_points`
    (`box_torch_ops.py:220-251`): grid cell centers in the box local frame
    ((idx + 0.5)/G * dim - dim/2), rotated by yaw via the `rotation_2d`
    convention (p_out = p @ [[c, -s], [s, c]]), shifted to the box center.
    Note dense_idx order is (x_idx, y_idx) pairs from `nonzero` of a
    (G, G) grid — row-major over the first ("x") axis.
    """
    center = rois[..., 0:2]
    dim = rois[..., 3:5]
    angle = rois[..., -1]

    g = grid_size
    ii = jnp.arange(g, dtype=rois.dtype)
    # nonzero() of (G, G) gives (row, col) = (x_idx, y_idx) pairs row-major
    xs = jnp.repeat(ii, g)
    ys = jnp.tile(ii, g)
    dense_idx = jnp.stack([xs, ys], axis=-1)  # (G^2, 2)

    local = (dense_idx + 0.5) / g * dim[..., None, :] - dim[..., None, :] / 2

    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    gx = local[..., 0] * c - local[..., 1] * s
    gy = local[..., 0] * s + local[..., 1] * c
    pts = jnp.stack([gx, gy], axis=-1)
    return pts + center[..., None, :]


@SECOND_STAGE.register_module
class BEVStrideFeature(nn.Module):
    feature_sources: Sequence[str]
    pillar_size: float
    pc_range: Sequence[float]
    out_stride: int = 4
    grid_size: int = 7
    in_channels: int = 128
    share_channels: int = 64
    backbone_channels: Optional[Dict[str, int]] = None
    backbone_strides: Optional[Dict[str, int]] = None
    dtype: Any = jnp.float32

    def _out_channels(self):
        opt_strides = [1, 2, 4]
        opt_out_channels = [32, 64, 128]
        return opt_out_channels[opt_strides.index(self.out_stride)]

    @nn.compact
    def __call__(self, bev_feature, backbone_features, rois, train: bool = True):
        """bev_feature: (B, H3, W3, C) neck output at the conv3 scale;
        backbone_features: dict of (features, mask); rois: (B, R, 7+).

        Returns (roi_features (B, R, G^2 * C'), point_features
        (B, R, G^2, C'), point_coords (B, R, G^2, 2)).
        """
        out_ch = self._out_channels()
        strides = self.backbone_strides or {"conv3": 4}
        B = rois.shape[0]

        # step 1: aggregate multi-scale features at out_stride
        up = int(strides["conv3"] / self.out_stride)
        x = bev_feature
        if up > 1:
            x = nn.ConvTranspose(
                out_ch, (up, up), strides=(up, up), use_bias=False,
                kernel_init=_XAVIER, dtype=self.dtype,
                param_dtype=jnp.float32, name="top_down_conv",
            )(x)
        else:
            x = nn.Conv(
                out_ch, (1, 1), use_bias=False, kernel_init=_XAVIER,
                dtype=self.dtype, param_dtype=jnp.float32,
                name="top_down_conv",
            )(x)
        x = MaskedBatchNorm(out_ch, dtype=self.dtype, name="top_down_bn")(
            x, mask=None, train=train
        )
        feats = [nn.relu(x)]

        for src_name in self.feature_sources:
            if src_name not in ("conv1", "conv2", "conv3", "conv4"):
                continue
            src = backbone_features[src_name]
            src_feat, src_mask = src if isinstance(src, tuple) else (src, None)
            stride_ratio = strides[src_name] / self.out_stride
            if stride_ratio >= 1:
                k = int(stride_ratio)
                if k > 1:
                    y = nn.ConvTranspose(
                        out_ch, (k, k), strides=(k, k), use_bias=False,
                        kernel_init=_XAVIER, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"lat_{src_name}",
                    )(src_feat)
                else:
                    y = nn.Conv(
                        out_ch, (1, 1), use_bias=False, kernel_init=_XAVIER,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"lat_{src_name}",
                    )(src_feat)
                y = MaskedBatchNorm(
                    out_ch, dtype=self.dtype, name=f"lat_bn_{src_name}"
                )(y, mask=None, train=train)
            else:
                # downsample path keeps sparse (masked BN over active sites)
                k = int(round(1 / stride_ratio))
                y = nn.Conv(
                    out_ch, (k, k), strides=(k, k), use_bias=True,
                    kernel_init=_XAVIER, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"lat_{src_name}",
                )(src_feat)
                new_mask = None
                if src_mask is not None:
                    m = src_mask.astype(jnp.float32)[..., None]
                    new_mask = nn.max_pool(
                        m, (k, k), strides=(k, k)
                    )[..., 0] > 0.5
                y = MaskedBatchNorm(
                    out_ch, dtype=self.dtype, name=f"lat_bn_{src_name}"
                )(y, mask=new_mask, train=train)
            feats.append(nn.relu(y))

        fused = jnp.concatenate(feats, axis=-1)
        fused = nn.Conv(
            self.share_channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=True, kernel_init=_XAVIER, dtype=self.dtype,
            param_dtype=jnp.float32, name="fusion_conv",
        )(fused)
        fused = MaskedBatchNorm(
            self.share_channels, dtype=self.dtype, name="fusion_bn"
        )(fused, mask=None, train=train)
        fused = nn.relu(fused)  # (B, H', W', share)

        # step 2: rotated RoI grid + bilinear interpolation
        pts = roi_grid_points(rois, self.grid_size)  # (B, R, G^2, 2)
        x_idx = (pts[..., 0] - self.pc_range[0]) / (
            self.out_stride * self.pillar_size
        )
        y_idx = (pts[..., 1] - self.pc_range[1]) / (
            self.out_stride * self.pillar_size
        )

        def per_sample(im, xs, ys):
            flat = bilinear_interpolate(im, xs.reshape(-1), ys.reshape(-1))
            return flat.reshape(xs.shape + (im.shape[-1],))

        point_feats = jax.vmap(per_sample)(fused, x_idx, y_idx)
        roi_feats = point_feats.reshape(B, rois.shape[1], -1)
        return roi_feats, point_feats, pts


@SECOND_STAGE.register_module
class BEVFeature(nn.Module):
    """conv4-anchored multi-scale fusion variant
    (`det3d/models/second_stage/bev_interpolation.py:18-158`): identical RoI
    grid pooling to BEVStrideFeature but the top-down path starts from the
    stride-8 neck output."""

    feature_sources: Sequence[str]
    pillar_size: float
    pc_range: Sequence[float]
    out_stride: int = 4
    grid_size: int = 7
    in_channels: int = 256
    share_channels: int = 64
    backbone_channels: Optional[Dict[str, int]] = None
    backbone_strides: Optional[Dict[str, int]] = None
    dtype: Any = jnp.float32

    def _out_channels(self):
        opt_strides = [1, 2, 4, 8]
        opt_out_channels = [32, 64, 128, 256]
        return opt_out_channels[opt_strides.index(self.out_stride)]

    @nn.compact
    def __call__(self, bev_feature, backbone_features, rois, train: bool = True):
        out_ch = self._out_channels()
        strides = self.backbone_strides or {"conv4": 8}
        B = rois.shape[0]

        up = int(strides["conv4"] / self.out_stride)
        if up > 1:
            x = nn.ConvTranspose(
                out_ch, (up, up), strides=(up, up), use_bias=False,
                kernel_init=_XAVIER, dtype=self.dtype,
                param_dtype=jnp.float32, name="top_down_conv",
            )(bev_feature)
        else:
            x = nn.Conv(
                out_ch, (1, 1), use_bias=False, kernel_init=_XAVIER,
                dtype=self.dtype, param_dtype=jnp.float32,
                name="top_down_conv",
            )(bev_feature)
        x = MaskedBatchNorm(out_ch, dtype=self.dtype, name="top_down_bn")(
            x, mask=None, train=train
        )
        feats = [nn.relu(x)]

        for src_name in self.feature_sources:
            if src_name not in ("conv1", "conv2", "conv3", "conv4"):
                continue
            src = backbone_features[src_name]
            src_feat, src_mask = src if isinstance(src, tuple) else (src, None)
            stride_ratio = strides[src_name] / self.out_stride
            if stride_ratio > 1 or (self.out_stride == 8 and stride_ratio == 1):
                k = int(stride_ratio)
                if k > 1:
                    y = nn.ConvTranspose(
                        out_ch, (k, k), strides=(k, k), use_bias=False,
                        kernel_init=_XAVIER, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"lat_{src_name}",
                    )(src_feat)
                else:
                    y = nn.Conv(
                        out_ch, (1, 1), use_bias=False, kernel_init=_XAVIER,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"lat_{src_name}",
                    )(src_feat)
                y = MaskedBatchNorm(
                    out_ch, dtype=self.dtype, name=f"lat_bn_{src_name}"
                )(y, mask=None, train=train)
            else:
                k = int(round(1 / stride_ratio))
                y = nn.Conv(
                    out_ch, (k, k), strides=(k, k), use_bias=True,
                    kernel_init=_XAVIER, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"lat_{src_name}",
                )(src_feat)
                new_mask = None
                if src_mask is not None:
                    m = src_mask.astype(jnp.float32)[..., None]
                    new_mask = nn.max_pool(m, (k, k), strides=(k, k))[..., 0] > 0.5
                y = MaskedBatchNorm(
                    out_ch, dtype=self.dtype, name=f"lat_bn_{src_name}"
                )(y, mask=new_mask, train=train)
            feats.append(nn.relu(y))

        fused = jnp.concatenate(feats, axis=-1)
        fused = nn.Conv(
            self.share_channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=True, kernel_init=_XAVIER, dtype=self.dtype,
            param_dtype=jnp.float32, name="fusion_conv",
        )(fused)
        fused = MaskedBatchNorm(
            self.share_channels, dtype=self.dtype, name="fusion_bn"
        )(fused, mask=None, train=train)
        fused = nn.relu(fused)

        pts = roi_grid_points(rois, self.grid_size)
        x_idx = (pts[..., 0] - self.pc_range[0]) / (
            self.out_stride * self.pillar_size
        )
        y_idx = (pts[..., 1] - self.pc_range[1]) / (
            self.out_stride * self.pillar_size
        )

        def per_sample(im, xs, ys):
            flat = bilinear_interpolate(im, xs.reshape(-1), ys.reshape(-1))
            return flat.reshape(xs.shape + (im.shape[-1],))

        point_feats = jax.vmap(per_sample)(fused, x_idx, y_idx)
        roi_feats = point_feats.reshape(B, rois.shape[1], -1)
        return roi_feats, point_feats, pts


@SECOND_STAGE.register_module
class BEVFeatureExtractor(nn.Module):
    """Box-center BEV pooling (`second_stage/bird_eye_view.py:11-40`):
    bilinear-sample the neck map at given centers."""

    pc_start: Sequence[float]
    voxel_size: Sequence[float]
    out_stride: int
    num_point: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bev_feature, batch_centers, train: bool = True):
        """bev_feature (B, H, W, C); batch_centers (B, N, 2) -> (B, N', C')."""
        xs = (batch_centers[..., 0] - self.pc_start[0]) / (
            self.voxel_size[0] * self.out_stride
        )
        ys = (batch_centers[..., 1] - self.pc_start[1]) / (
            self.voxel_size[0] * self.out_stride
        )

        def per_sample(im, x, y):
            return bilinear_interpolate(im, x, y)

        feats = jax.vmap(per_sample)(bev_feature, xs, ys)
        if self.num_point > 1:
            B, N, C = feats.shape
            sec = N // self.num_point
            feats = jnp.concatenate(
                [feats[:, i * sec:(i + 1) * sec] for i in range(self.num_point)],
                axis=-1,
            )
        return feats
