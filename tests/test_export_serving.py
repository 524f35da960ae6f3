"""Serving export (`tools/export_serving.py`): the serialized StableHLO
artifact must reproduce the live jitted inference after a
serialize/deserialize round trip, with the weights baked in (no params
arguments in the serving signature).  Integer outputs (labels) must match
exactly; float outputs to ~1e-5 — the deserialized module recompiles
through a fresh XLA pipeline whose fusion choices can reassociate fp32
reductions at the last ulp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jexport

from pillarnet_lts_tpu.apis import build_model_from_cfg
from pillarnet_lts_tpu.eval_utils import make_infer_fn
from pillarnet_lts_tpu.utils.config import Config


@pytest.mark.slow
def test_serving_export_roundtrip():
    cfg = Config.fromfile("configs/demo/pillarnet18_demo.py")
    model = build_model_from_cfg(cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(
        rng.uniform(-15, 15, (1, 512, 5)).astype(np.float32))
    msk = jnp.ones((1, 512), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, msk, train=False)
    infer = make_infer_fn(model)
    want = infer(variables["params"], variables["batch_stats"], pts, msk)

    def serving_fn(points, points_mask):
        return infer(variables["params"], variables["batch_stats"],
                     points, points_mask)

    exported = jexport.export(jax.jit(serving_fn))(
        jax.ShapeDtypeStruct(pts.shape, pts.dtype),
        jax.ShapeDtypeStruct(msk.shape, msk.dtype))
    blob = exported.serialize()
    assert len(blob) > 1000

    fn = jexport.deserialize(blob)
    got = fn.call(np.asarray(pts), np.asarray(msk))
    assert set(got) == set(want)
    for k in want:
        g, w = np.asarray(got[k]), np.asarray(want[k])
        if np.issubdtype(w.dtype, np.integer) or w.dtype == bool:
            np.testing.assert_array_equal(g, w, err_msg=k)
        else:
            np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5,
                                       err_msg=k)
