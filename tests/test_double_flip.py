"""Double-flip TTA: pipeline produces 4-group batches; predict averages them.

Property: for a model invariant under the flips (here: evaluated on a
symmetric input), the TTA-averaged decode equals the plain decode; and the
averaging machinery reproduces single-sample predictions when all four
groups carry identical (already unflipped) maps.
"""

import numpy as np
import jax.numpy as jnp

from pillarnet_lts_tpu.models.bbox_heads.center_head import (
    _average_double_flip,
)
from pillarnet_lts_tpu.datasets.pipelines.test_aug import DoubleFlip
from pillarnet_lts_tpu.datasets.pipelines.formating import Reformat
from pillarnet_lts_tpu.parallel.collate import collate_batch


def test_double_flip_pipeline_produces_groups_of_four():
    pts = np.random.RandomState(0).randn(100, 5).astype(np.float32)
    res = {
        "mode": "val",
        "metadata": {"token": "t0"},
        "lidar": {"points": pts},
    }
    res, _ = DoubleFlip()(res, {})
    bundle, _ = Reformat(double_flip=True)(res, {})
    assert isinstance(bundle, list) and len(bundle) == 4
    np.testing.assert_allclose(bundle[1]["points"][:, 1], -pts[:, 1])
    np.testing.assert_allclose(bundle[2]["points"][:, 0], -pts[:, 0])
    np.testing.assert_allclose(bundle[3]["points"][:, :2], -pts[:, :2])

    batch = collate_batch([bundle], max_points=128)
    assert batch["points"].shape[0] == 4  # flattened group


def test_average_double_flip_identity_on_consistent_groups():
    rng = np.random.RandomState(1)
    H = W = 4
    base = {
        "hm": rng.randn(1, H, W, 2).astype(np.float32),
        "reg": rng.rand(1, H, W, 2).astype(np.float32),
        "height": rng.randn(1, H, W, 1).astype(np.float32),
        "dim": rng.randn(1, H, W, 3).astype(np.float32),
        "rot": rng.randn(1, H, W, 2).astype(np.float32),
        "vel": rng.randn(1, H, W, 2).astype(np.float32),
    }
    # construct the 4 flipped variants exactly as the head will undo them
    group = {}
    for k, v in base.items():
        v0 = v[0]
        v1 = v0[::-1, :, :].copy()   # y flip (H axis)
        v2 = v0[:, ::-1, :].copy()   # x flip (W axis)
        v3 = v0[::-1, ::-1, :].copy()
        group[k] = np.stack([v0, v1, v2, v3])[None].reshape(4, H, W, -1)

    # forward-apply the geometric corrections the head expects to undo
    g = {k: v.copy() for k, v in group.items()}
    g["reg"][1, ..., 1] = 1 - g["reg"][1, ..., 1]
    g["reg"][2, ..., 0] = 1 - g["reg"][2, ..., 0]
    g["reg"][3, ..., 0] = 1 - g["reg"][3, ..., 0]
    g["reg"][3, ..., 1] = 1 - g["reg"][3, ..., 1]
    g["rot"][1, ..., 1] *= -1
    g["rot"][2, ..., 0] *= -1
    g["rot"][3, ..., 0] *= -1
    g["rot"][3, ..., 1] *= -1
    g["vel"][1, ..., 1] *= -1
    g["vel"][2, ..., 0] *= -1
    g["vel"][3] *= -1

    preds = {k: jnp.asarray(v) for k, v in g.items()}
    out = _average_double_flip(preds)
    # hm/dim come back PRE-ACTIVATED (reference averages sigmoid(hm) and
    # exp(clamped dim) across the variants, `center_head.py:257-303`); on
    # geometrically-consistent groups that equals activating the base map.
    expected = dict(base)
    expected["hm"] = 1.0 / (1.0 + np.exp(-base["hm"]))
    expected["dim"] = np.exp(np.clip(base["dim"], -1.2, 3.2))
    for k in base:
        np.testing.assert_allclose(
            np.asarray(out[k]), expected[k], atol=1e-6, err_msg=k
        )


def test_average_double_flip_activation_before_mean():
    """Inconsistent variants expose the averaging order: the reference takes
    mean-of-sigmoid / mean-of-exp, NOT sigmoid-of-mean / exp-of-mean."""
    rng = np.random.RandomState(5)
    hm = rng.randn(4, 2, 2, 1).astype(np.float32) * 3
    dim = rng.randn(4, 2, 2, 3).astype(np.float32)
    iou = rng.randn(4, 2, 2, 1).astype(np.float32)
    preds = {
        "hm": jnp.asarray(hm),
        "dim": jnp.asarray(dim),
        "iou": jnp.asarray(iou),
        "reg": jnp.zeros((4, 2, 2, 2), np.float32),
        "rot": jnp.zeros((4, 2, 2, 2), np.float32),
        "height": jnp.zeros((4, 2, 2, 1), np.float32),
    }
    out = _average_double_flip(preds)

    def unflip(v):
        v = v.reshape(1, 4, 2, 2, -1).copy()
        v[:, 1] = v[:, 1, ::-1]
        v[:, 2] = v[:, 2, :, ::-1]
        v[:, 3] = v[:, 3, ::-1, ::-1]
        return v

    want_hm = (1.0 / (1.0 + np.exp(-unflip(hm)))).mean(axis=1)
    want_dim = np.exp(np.clip(unflip(dim), -1.2, 3.2)).mean(axis=1)
    want_iou = np.clip((unflip(iou) + 1.0) * 0.5, 0, 1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(out["hm"]), want_hm, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["dim"]), want_dim, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["iou"]), want_iou, atol=1e-6)
