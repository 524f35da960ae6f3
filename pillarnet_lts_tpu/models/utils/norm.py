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


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.01
    eps: float = 1e-3
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        """x: (..., C); mask: bool broadcastable to x.shape[:-1] or None."""
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        xf = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))

        if train:
            if mask is None:
                cnt = jnp.asarray(
                    jnp.prod(jnp.array(x.shape[:-1])), jnp.float32
                )
                s = xf.sum(axis=reduce_axes)
                ss = (xf * xf).sum(axis=reduce_axes)
            else:
                mf = mask.astype(jnp.float32)[..., None]
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
