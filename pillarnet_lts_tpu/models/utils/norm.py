"""Normalization layers with sparse-site (masked) statistics.

The reference applies ``nn.BatchNorm1d`` to the *feature rows of sparse
tensors* (`det3d/models/backbones/base.py:122-130` via `build_norm_layer`,
`det3d/models/utils/norm.py`) — i.e. statistics are computed over active BEV
sites only, across the whole batch. In the masked-dense formulation used
here, that becomes a BatchNorm whose mean/var are mask-weighted. Dense
layers (`conv5`, necks, heads) use the same module with ``mask=None`` which
reduces to plain BatchNorm2d semantics.

Cross-replica (syncBN, reference `torchie/apis/train.py:270-271` apex) is a
`lax.psum` over ``axis_name`` when the module is used inside `shard_map`/
`pmap`-style named axes; under plain pjit-with-sharded-batch, XLA computes
global batch stats automatically because the reduction spans the full arrays.

Torch conventions preserved: ``momentum`` is the *update fraction*
(running = (1 - m) * running + m * batch), normalization uses biased batch
variance while the running variance stores the unbiased estimate.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# internal diagnostics knob for eval-mode BN numerics experiments:
#   "full" (default) — fp32 normalize;
#   "bf16" — normalize in the compute dtype;
#   "skip" — identity (COST measurement only, numerically wrong).
_EVAL_MODE = "full"


def set_eval_mode(mode):
    global _EVAL_MODE
    assert mode in ("full", "bf16", "skip")
    _EVAL_MODE = mode


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.01
    eps: float = 1e-3
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        # setup-style (not @nn.compact) so sibling modules can fold the
        # eval-mode affine into their conv weights via fold_factors()
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        self.ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        self.ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )

    def fold_factors(self):
        """Eval-mode BN as an affine y = x * inv + shift (fp32):
        inv = scale / sqrt(var + eps), shift = bias - mean * inv. Folding
        inv into the preceding conv's weights removes the whole post-conv
        normalization pass (and its layout copies) at inference."""
        inv = jax.lax.rsqrt(self.ra_var.value + self.eps) * self.scale
        shift = self.bias - self.ra_mean.value * inv
        return inv, shift

    def __call__(self, x, mask=None, train: bool = True, stat_mask=None):
        """x: (..., C); mask: bool broadcastable to x.shape[:-1] or None.

        `stat_mask` (train only): use a different mask for the batch
        statistics than for the re-zeroing. Used by overlapped W-tiled
        stage execution (`backbones/base.py::w_chunk`): halo columns are
        duplicates of neighbouring tiles' interiors, so they are excluded
        from the statistics (stat_mask zero there) but still normalized
        and re-zeroed like their interior twins — making tiled training
        statistics exactly equal to plain execution.
        """
        scale = self.scale
        bias = self.bias
        ra_mean = self.ra_mean
        ra_var = self.ra_var

        if not train and _EVAL_MODE != "full":
            if _EVAL_MODE == "skip":
                return x
            inv16 = (jax.lax.rsqrt(ra_var.value + self.eps) * scale).astype(
                x.dtype
            )
            bias16 = (bias - ra_mean.value * jax.lax.rsqrt(
                ra_var.value + self.eps) * scale).astype(x.dtype)
            y = x * inv16 + bias16
            if mask is not None:
                y = y * mask.astype(y.dtype)[..., None]
            return y.astype(self.dtype)

        xf = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))

        if train:
            smask = mask if stat_mask is None else stat_mask
            if smask is None:
                cnt = jnp.asarray(
                    jnp.prod(jnp.array(x.shape[:-1])), jnp.float32
                )
                s = xf.sum(axis=reduce_axes)
                ss = (xf * xf).sum(axis=reduce_axes)
            else:
                mf = smask.astype(jnp.float32)[..., None]
                cnt = mf.sum()
                s = (xf * mf).sum(axis=reduce_axes)
                ss = (xf * xf * mf).sum(axis=reduce_axes)

            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)

            cnt_safe = jnp.maximum(cnt, 1.0)
            mean = s / cnt_safe
            var = jnp.maximum(ss / cnt_safe - mean * mean, 0.0)

            if self.is_mutable_collection("batch_stats"):
                unbiased = var * cnt_safe / jnp.maximum(cnt_safe - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (xf - mean) * inv + bias
        if mask is not None:
            y = y * mask.astype(y.dtype)[..., None]
        return y.astype(self.dtype)


class MaskedGroupNorm(nn.Module):
    """GroupNorm with optional sparse-site statistics.

    The reference's ``build_norm_layer`` dispatches ``dict(type="GN")`` to
    ``nn.GroupNorm`` (`det3d/models/utils/norm.py:63,98-104`); no live config
    uses it, but the capability is part of the norm-layer surface. Stats are
    per (sample, group) over spatial sites x in-group channels; with a mask,
    only active sites contribute and inactive sites are re-zeroed, matching
    MaskedBatchNorm's convention.
    """

    features: int
    num_groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        """x: (B, ..., C); mask: bool broadcastable to x.shape[:-1] or None."""
        if self.features % self.num_groups:
            raise ValueError(
                f"features={self.features} not divisible by "
                f"num_groups={self.num_groups}"
            )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

        B = x.shape[0]
        cg = self.features // self.num_groups
        xf = x.astype(jnp.float32).reshape(B, -1, self.num_groups, cg)
        if mask is None:
            w = jnp.ones((B, xf.shape[1], 1, 1), jnp.float32)
        else:
            w = jnp.broadcast_to(
                mask.astype(jnp.float32)[..., None], x.shape[:-1] + (1,)
            ).reshape(B, -1, 1, 1)

        cnt = jnp.maximum(w.sum(axis=1, keepdims=True) * cg, 1.0)  # (B,1,1,1)
        mean = (xf * w).sum(axis=(1, 3), keepdims=True) / cnt
        var = (jnp.square(xf - mean) * w).sum(axis=(1, 3), keepdims=True) / cnt
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(x.shape) * scale + bias
        if mask is not None:
            y = y * mask.astype(y.dtype)[..., None]
        return y.astype(self.dtype)


def build_norm(norm_cfg, features, dtype=jnp.float32):
    """Norm-layer factory mirroring the reference's ``build_norm_layer``
    dispatch (`det3d/models/utils/norm.py:55-104`): BN/BN1d/SyncBN ->
    MaskedBatchNorm (mask at call time selects sparse vs dense statistics,
    named-axis psum replaces apex syncBN), GN -> MaskedGroupNorm."""
    cfg = dict(norm_cfg or {"type": "BN"})
    t = cfg.pop("type", "BN")
    cfg.pop("requires_grad", None)  # torch-only knob in reference configs
    if t in ("BN", "BN1d", "SyncBN"):
        return MaskedBatchNorm(
            features, momentum=cfg.get("momentum", 0.01),
            eps=cfg.get("eps", 1e-3), dtype=dtype,
        )
    if t == "GN":
        return MaskedGroupNorm(
            features, num_groups=cfg.get("num_groups", 32),
            eps=cfg.get("eps", 1e-5), dtype=dtype,
        )
    raise NotImplementedError(f"norm type {t} not supported")


def get_norm_kwargs(norm_cfg):
    """Translate a reference-style norm config dict
    (e.g. ``dict(type="BN1d", momentum=0.01, eps=1e-3)``) into
    MaskedBatchNorm kwargs. BN and BN1d collapse to the same module here —
    the mask argument at call time decides sparse vs dense statistics."""
    if norm_cfg is None:
        return dict(momentum=0.01, eps=1e-3)
    t = norm_cfg.get("type", "BN")
    if t not in ("BN", "BN1d", "SyncBN"):
        raise NotImplementedError(f"norm type {t} not supported")
    return dict(
        momentum=norm_cfg.get("momentum", 0.01),
        eps=norm_cfg.get("eps", 1e-3),
    )
