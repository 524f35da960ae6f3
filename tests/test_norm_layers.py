"""Norm-layer factory: GroupNorm parity with flax, masked-stats semantics."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from pillarnet_lts_tpu.models.utils import (
    MaskedBatchNorm, MaskedGroupNorm, build_norm,
)


def test_groupnorm_matches_flax_unmasked():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(2, 5, 5, 8).astype(np.float32))

    ours = MaskedGroupNorm(8, num_groups=4, eps=1e-5)
    ref = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    got = ours.apply(ours.init(jax.random.PRNGKey(0), x), x)
    want = ref.apply(ref.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_groupnorm_masked_stats_ignore_inactive_sites():
    """Masked stats must equal dense stats computed on the active subset."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 6, 8).astype(np.float32)
    mask = rng.rand(1, 6, 6) > 0.4

    gn = MaskedGroupNorm(8, num_groups=2)
    v = gn.init(jax.random.PRNGKey(0), jnp.array(x))
    got = np.asarray(gn.apply(v, jnp.array(x), jnp.array(mask)))

    # manual oracle over active sites only
    xa = x.reshape(1, 36, 2, 4)
    w = mask.reshape(1, 36, 1, 1).astype(np.float32)
    cnt = w.sum() * 4
    mean = (xa * w).sum(axis=(1, 3), keepdims=True) / cnt
    var = (((xa - mean) ** 2) * w).sum(axis=(1, 3), keepdims=True) / cnt
    want = ((xa - mean) / np.sqrt(var + 1e-5)).reshape(x.shape)
    want = want * mask[..., None]

    np.testing.assert_allclose(got, want, atol=1e-5)
    # inactive sites re-zeroed
    assert np.all(got[~mask[..., None].repeat(8, -1)] == 0)


def test_build_norm_dispatch():
    assert isinstance(build_norm(dict(type="BN", momentum=0.05), 16),
                      MaskedBatchNorm)
    assert isinstance(build_norm(dict(type="SyncBN"), 16), MaskedBatchNorm)
    gn = build_norm(dict(type="GN", num_groups=8), 16)
    assert isinstance(gn, MaskedGroupNorm) and gn.num_groups == 8
    assert isinstance(build_norm(None, 16), MaskedBatchNorm)
    try:
        build_norm(dict(type="LN"), 16)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass
