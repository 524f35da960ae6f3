"""Evaluation helpers: padded device detections -> per-sample host dicts."""

import numpy as np


def make_infer_fn(model, test_cfg=None, quant=None):
    """Jitted forward + decode for evaluation.

    Single shared factory for `Trainer.val` and `tools/dist_test.py`
    (reference: the eval forward in `torchie/apis/train.py:93` used by both
    `trainer.py:438-494` and `tools/dist_test.py:164-180`). Callers should
    build this ONCE per model and reuse it — jax.jit caches retraces by
    shape, so a cached fn makes repeated val epochs in a
    [('train',k),('val',1)] workflow compile-free after the first.

    `quant`: optional calibrated 'quant' collection (runtime/quantize.py);
    when given and the backbone was built with quant=True, conv cores run
    int8. Closure-captured so the infer signature stays unchanged.
    """
    import jax

    if test_cfg is None:
        test_cfg = model.processed_test_cfg()

    @jax.jit
    def infer(params, batch_stats, points, points_mask):
        variables = {"params": params, "batch_stats": batch_stats}
        if quant is not None:
            variables["quant"] = quant
        preds = model.apply(variables, points, points_mask, train=False)
        return model.predict({}, preds, test_cfg)

    return infer


def pipelined_infer(infer, batches, make_args, metas_of, depth=4,
                    on_progress=None):
    """Run `infer` over `batches` with up to `depth` dispatches in flight,
    yielding (host_detections, metadata) pairs in batch order.

    Single shared implementation for `Trainer.val` and `tools/dist_test.py`
    (the metadata queue must stay in lockstep with the lazily-consumed
    argument generator — subtle enough to keep in one place).

    make_args(batch) -> infer argument tuple; metas_of(batch) -> the
    per-sample metadata list (caller handles double-flip [::4] slicing);
    on_progress(i) called per yielded batch.
    """
    from .runtime.serving import ServingPipeline

    pipe = ServingPipeline(infer, depth=depth)
    metas_q = []

    def _args():
        for batch in batches:
            metas_q.append(metas_of(batch))
            yield make_args(batch)

    for i, det in enumerate(pipe.map(_args())):
        if on_progress is not None:
            on_progress(i)
        yield det, metas_q[i]


def detections_to_host(det, metadata):
    """Split a batched padded detection dict into per-sample dicts.

    det: {'box3d_lidar': (B, K, D), 'scores': (B, K), 'label_preds': (B, K),
          'mask': (B, K)} (device or numpy arrays)
    metadata: list of length B.
    Returns list of dicts shaped like the reference's per-sample outputs
    (`center_head.py:405-409`), with padding rows removed.
    """
    boxes = np.asarray(det["box3d_lidar"])
    scores = np.asarray(det["scores"])
    labels = np.asarray(det["label_preds"])
    mask = np.asarray(det["mask"]).astype(bool)

    out = []
    for i in range(boxes.shape[0]):
        m = mask[i]
        out.append(
            {
                "box3d_lidar": boxes[i][m],
                "scores": scores[i][m],
                "label_preds": labels[i][m],
                "metadata": metadata[i] if metadata else None,
            }
        )
    return out
