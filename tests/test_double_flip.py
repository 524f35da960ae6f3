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
    for k in base:
        np.testing.assert_allclose(
            np.asarray(out[k]), base[k], atol=1e-6, err_msg=k
        )
