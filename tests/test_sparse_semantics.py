"""Masked-dense conv == spconv semantics (SURVEY.md §7 hard part 1).

Oracle: an explicit sparse convolution that only gathers contributions from
active input sites (SubMConv2d rule) / computes the dilated occupancy for
strided SparseConv2d — compared against the masked-dense formulation used by
the backbone.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pillarnet_lts_tpu.models.backbones.base import (
    MaskedConv, SparseDownStage, dilate_mask,
)
from pillarnet_lts_tpu.models.utils.norm import MaskedBatchNorm


def _sparse_conv_oracle(x, mask, w, b, stride=1):
    """Explicit sparse conv: output (Ho, Wo, Cout); only active inputs
    contribute; output active set per spconv rule (k=3, pad=1)."""
    H, W, Cin = x.shape
    Cout = w.shape[-1]
    Ho, Wo = H // stride, W // stride
    out = np.zeros((Ho, Wo, Cout), np.float32)
    out_mask = np.zeros((Ho, Wo), bool)
    for oi in range(Ho):
        for oj in range(Wo):
            acc = np.zeros(Cout, np.float32)
            any_active = False
            for ki in range(3):
                for kj in range(3):
                    ii = oi * stride + ki - 1
                    jj = oj * stride + kj - 1
                    if 0 <= ii < H and 0 <= jj < W and mask[ii, jj]:
                        any_active = True
                        acc += x[ii, jj] @ w[ki, kj]
            if any_active:
                out_mask[oi, oj] = True
                out[oi, oj] = acc + (b if b is not None else 0)
    return out, out_mask


def test_subm_conv_matches_sparse_oracle():
    rng = np.random.RandomState(0)
    H = W = 12
    Cin, Cout = 4, 6
    mask = rng.rand(H, W) > 0.7
    x = rng.randn(H, W, Cin).astype(np.float32) * mask[..., None]

    conv = MaskedConv(Cout, in_features=Cin)
    params = conv.init(jax.random.PRNGKey(0), jnp.array(x[None]))
    w = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])

    y = np.asarray(conv.apply(params, jnp.array(x[None])))[0]
    # SubM semantics: mask output, same site set
    y_masked = y * mask[..., None]

    oracle, _ = _sparse_conv_oracle(x, mask, w, b, stride=1)
    # compare only at active sites (SubM output sites == input sites)
    np.testing.assert_allclose(
        y_masked[mask], oracle[mask], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(y_masked[~mask], 0.0)


def test_strided_conv_mask_matches_spconv_rule():
    rng = np.random.RandomState(1)
    H = W = 16
    mask = rng.rand(H, W) > 0.85
    got = np.asarray(dilate_mask(jnp.array(mask[None]), stride=2))[0]

    x = np.ones((H, W, 1), np.float32)
    _, want = _sparse_conv_oracle(
        x * mask[..., None], mask, np.ones((3, 3, 1, 1), np.float32), None,
        stride=2,
    )
    np.testing.assert_array_equal(got, want)


def test_strided_stage_values_match_oracle():
    """Full SparseDownStage conv (without BN scale effects) vs oracle."""
    rng = np.random.RandomState(2)
    H = W = 8
    Cin, Cout = 3, 5
    mask = rng.rand(H, W) > 0.6
    x = rng.randn(H, W, Cin).astype(np.float32) * mask[..., None]

    conv = MaskedConv(Cout, in_features=Cin, stride=2, use_bias=False)
    params = conv.init(jax.random.PRNGKey(1), jnp.array(x[None]))
    w = np.asarray(params["params"]["kernel"])
    y = np.asarray(conv.apply(params, jnp.array(x[None])))[0]
    new_mask = np.asarray(dilate_mask(jnp.array(mask[None]), 2))[0]
    y = y * new_mask[..., None]

    oracle, om = _sparse_conv_oracle(x, mask, w, None, stride=2)
    np.testing.assert_array_equal(new_mask, om)
    np.testing.assert_allclose(y[om], oracle[om], rtol=1e-4, atol=1e-5)


def test_masked_bn_stats_match_gathered_rows():
    """BN1d over sparse feature rows == masked BN over the dense map
    (`backbones/base.py:122-130` semantics)."""
    rng = np.random.RandomState(3)
    B, H, W, C = 2, 6, 6, 4
    mask = rng.rand(B, H, W) > 0.5
    x = rng.randn(B, H, W, C).astype(np.float32) * mask[..., None]

    bn = MaskedBatchNorm(C, momentum=0.01, eps=1e-3)
    variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask),
                        train=False)
    y, new_state = bn.apply(
        variables, jnp.array(x), jnp.array(mask), train=True,
        mutable=["batch_stats"],
    )
    y = np.asarray(y)

    rows = x[mask]  # (L, C) active rows across the whole batch
    mean = rows.mean(0)
    var = rows.var(0)
    want = (rows - mean) / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(y[mask], want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y[~mask], 0.0)

    # running stats: torch convention (momentum = update fraction, unbiased)
    n = rows.shape[0]
    want_var_running = 0.99 * 1.0 + 0.01 * var * n / (n - 1)
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["var"]), want_var_running,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["mean"]), 0.01 * mean, rtol=1e-4,
        atol=1e-6,
    )


def test_residual_block_preserves_inactive_zero():
    from pillarnet_lts_tpu.models.backbones.base import Sparse2DBasicBlock

    rng = np.random.RandomState(4)
    H = W = 10
    C = 8
    mask = rng.rand(H, W) > 0.7
    x = rng.randn(1, H, W, C).astype(np.float32) * mask[None, ..., None]

    block = Sparse2DBasicBlock(C)
    variables = block.init(
        jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask[None]), True
    )
    y = np.asarray(
        block.apply(variables, jnp.array(x), jnp.array(mask[None]), True,
                    mutable=["batch_stats"])[0]
    )
    # inactive sites stay exactly zero through conv+BN+residual+relu
    np.testing.assert_allclose(y[0][~mask], 0.0)
    assert np.abs(y[0][mask]).sum() > 0


def test_eval_fold_matches_unfolded_bn():
    """Inference folds BN into conv weights; the folded eval output must
    match explicit conv -> eval-BN -> mask to fp32 precision."""
    from pillarnet_lts_tpu.models.backbones.base import Sparse2DBasicBlock

    rng = np.random.RandomState(4)
    H = W = 16
    C = 8
    mask = rng.rand(H, W) > 0.6
    x = (rng.randn(H, W, C).astype(np.float32) * mask[..., None])[None]
    blk = Sparse2DBasicBlock(planes=C)
    variables = jax.device_get(
        blk.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask[None]),
                 train=False)
    )
    # non-trivial BN statistics and affine
    for bn in ("bn1", "bn2"):
        variables["batch_stats"][bn]["mean"] = rng.randn(C).astype(np.float32)
        variables["batch_stats"][bn]["var"] = rng.uniform(
            0.5, 2.0, C).astype(np.float32)
        variables["params"][bn]["scale"] = rng.uniform(
            0.5, 1.5, C).astype(np.float32)
        variables["params"][bn]["bias"] = rng.randn(C).astype(np.float32)

    folded = np.asarray(
        blk.apply(variables, jnp.asarray(x), jnp.asarray(mask[None]),
                  train=False)
    )

    # manual unfolded reference
    def conv(xx, w, b):
        out = jax.lax.conv_general_dilated(
            jnp.asarray(xx), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return np.asarray(out) + b

    def bn(xx, name):
        p = variables["params"][name]
        s = variables["batch_stats"][name]
        y = (xx - s["mean"]) / np.sqrt(s["var"] + 1e-3) * p["scale"] + p["bias"]
        return y * mask[None, ..., None]

    y = conv(x, variables["params"]["conv1"]["kernel"],
             variables["params"]["conv1"]["bias"])
    y = np.maximum(bn(y, "bn1"), 0)
    y = conv(y, variables["params"]["conv2"]["kernel"],
             variables["params"]["conv2"]["bias"])
    y = bn(y, "bn2")
    want = np.maximum(y + x, 0)
    np.testing.assert_allclose(folded, want, atol=1e-5)
