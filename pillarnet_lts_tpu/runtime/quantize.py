"""Post-training int8 calibration for the deploy path.

The backbone's int8 mode (`model.backbone.quant=True`, see
`models/backbones/base.py`) needs one per-conv activation scale, collected
by running normal bf16 eval forwards over a handful of representative
frames with the 'quant' collection mutable: every quantized conv `sow`s its
input absmax (running max within one apply); this module merges the maxima
across calibration batches and returns the variables dict extended with the
final 'quant' collection. Thread that dict into any eval apply and the conv
cores switch to int8 (weights per-output-channel symmetric, activations
per-tensor symmetric — the standard TensorRT-style PTQ recipe the reference
ecosystem uses to deploy these CenterPoint-family models).

Reference deploy analog: the reference itself ships fp16/fp32 only; int8 is
the conventional production step downstream of it (ONNX -> TensorRT int8).
"""

import jax
import jax.numpy as jnp


def enable_backbone_quant(model_cfg, head=False):
    """Flip the int8 deploy flags in a model config dict — backbone, and
    (round 4) reader MLP and neck, which measured accuracy-neutral on the
    non-overfit demo model (mAP 0.283 fp vs 0.283 backbone / 0.283 reader
    / 0.280 neck). The CENTER HEAD stays bf16 by default: its int8 mode
    exists (`head=True` flips `bbox_head.quant`) but was measured and
    rejected twice. Round-5 full-scope study at 32-frame non-overfit
    scale (`tools/quant_scope_study.py`, 2026-08-19), per-INPUT-channel
    scales on share conv + fused wide SepHead conv, both calibration
    reductions: fp mAP 0.310; default scope -0.011 (mean) / -0.034 (max);
    +head -0.195 (mean) / -0.238 (max); head alone -0.186 / -0.227 — the
    8-bit shared feature is too coarse for the metric regression
    branches, and the head is only ~2 ms of the budget.
    Handles both single-stage ({'backbone': ...}) and two-stage
    ({'first_stage_cfg': ...}) layouts."""
    stage1 = (model_cfg if "backbone" in model_cfg
              else model_cfg["first_stage_cfg"])
    for comp in ("backbone", "reader", "neck"):
        if comp in stage1 and isinstance(stage1[comp], dict):
            stage1[comp]["quant"] = True
    if head and isinstance(stage1.get("bbox_head"), dict):
        stage1["bbox_head"]["quant"] = True
    return model_cfg


def calibrate(model, variables, batches, reduce="max"):
    """Collect int8 activation scales over calibration batches.

    Args:
      model: a built detector (flax module) whose backbone has quant=True.
      variables: init/checkpoint variables (params + batch_stats, no 'quant'
        collection — if one is present it is dropped and re-collected).
      batches: iterable of (points, points_mask) device/np arrays.
      reduce: how to merge per-batch absmax observations — 'max' (never
        clips a calibration activation; outlier-sensitive) or 'mean'
        (average of per-batch maxima, the standard moving-average observer;
        clips rare outliers for finer resolution on the bulk).

    Returns:
      variables dict with a calibrated 'quant' collection added.
    """
    base = {k: v for k, v in variables.items() if k != "quant"}

    @jax.jit
    def one(v, p, m):
        _, aux = model.apply(v, p, m, train=False, mutable=["quant"])
        if "quant" not in aux:
            raise ValueError(
                "no conv observed an activation scale — was the model "
                "built with backbone quant=True? (enable_backbone_quant)"
            )
        return aux["quant"]

    per_batch = [
        jax.device_get(one(base, jnp.asarray(p), jnp.asarray(m)))
        for p, m in batches
    ]
    if not per_batch:
        raise ValueError("calibrate() needs at least one batch")
    if reduce == "max":
        from functools import reduce as _reduce

        # elementwise maximum — scales may be vectors (the PFE MLP
        # calibrates per-input-channel), so python max() is wrong
        quant = jax.tree.map(
            lambda *xs: jnp.asarray(_reduce(jnp.maximum, xs)), *per_batch
        )
    elif reduce == "mean":
        quant = jax.tree.map(
            lambda *xs: jnp.asarray(sum(xs) / len(xs)), *per_batch
        )
    else:
        raise ValueError(f"unknown reduce {reduce!r}")
    return {**base, "quant": quant}
