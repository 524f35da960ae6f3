"""Round-5 full-scope PTQ study: re-adjudicate head int8 at non-overfit
scale (judge item r4-#3).

The round-4 bisection condemned head int8 via the per-TENSOR attempt's
demo collapse (0.283 -> 0.086) and measured the per-input-channel SepHead
recipe only in isolation (0.192). This study runs the 32-frame non-overfit
harness (same recipe as tests/test_quant_int8.py::
test_int8_accuracy_beyond_overfit_scale: 32 frames, 96 shuffled train
steps — too few to memorize) and evaluates FOUR scopes with both
calibration reductions:

  fp          bf16 everywhere (the reference-parity eval path)
  default     reader MLP + backbone + neck int8 (enable_backbone_quant)
  +head       default + CenterHead int8 (share conv + per-input-channel
              fused wide SepHead conv, center_head.py:145-173)
  head_only   CenterHead int8 alone (isolates the head's contribution)

Decision rule (recorded in runtime/quantize.py + ROADMAP): flip the head
default ON if (+head - default) stays within the backbone study's 0.1 mAP
budget at comparable relative cost; otherwise record the measured bound.

Run on CPU (the accuracy question is hardware-independent):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/quant_scope_study.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CFG_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs/demo/pillarnet18_demo.py",
)


def main():
    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    import jax.numpy as jnp
    import optax

    from pillarnet_lts_tpu.apis import build_model_from_cfg
    from pillarnet_lts_tpu.datasets import build_dataset
    from pillarnet_lts_tpu.datasets.loader import DataLoader
    from pillarnet_lts_tpu.eval_utils import detections_to_host, make_infer_fn
    from pillarnet_lts_tpu.parallel.train_state import TrainState
    from pillarnet_lts_tpu.parallel.train_step import make_train_step
    from pillarnet_lts_tpu.runtime import recompute_batch_stats
    from pillarnet_lts_tpu.runtime.quantize import (
        calibrate,
        enable_backbone_quant,
    )
    from pillarnet_lts_tpu.utils.config import Config

    cfg = Config.fromfile(CFG_PATH)
    n_frames, n_points, max_points, bs = 32, 2048, 4096, 8
    pre = dict(cfg.train_pipeline[0]["cfg"])
    pre.update(no_augmentation=True, shuffle_points=False)
    ds_cfg = dict(cfg.data["train"])
    ds_cfg.update(num_frames=n_frames, num_points=n_points)
    ds_cfg["pipeline"] = [
        dict(type="Preprocess", cfg=pre),
        dict(type="AssignLabel", cfg=cfg.train_cfg["assigner"]),
        dict(type="Reformat"),
    ]
    loader = DataLoader(
        build_dataset(ds_cfg), batch_size=bs, shuffle=True,
        num_workers=1, max_points=max_points, drop_last=True,
    )
    keys = ("points", "points_mask", "hm", "anno_box", "ind", "mask",
            "cat", "gt_box", "gt_boxes_and_cls")

    def to_dev(raw):
        return {
            k: ([jnp.asarray(x) for x in v] if isinstance(v, list)
                else jnp.asarray(v))
            for k, v in raw.items() if k in keys
        }

    model = build_model_from_cfg(cfg)
    first = to_dev(next(iter(loader)))
    variables = model.init(
        jax.random.PRNGKey(0), first["points"], first["points_mask"],
        train=False,
    )
    tx = optax.chain(optax.clip_by_global_norm(35.0), optax.adam(3e-3))
    state = TrainState.create(variables, tx)
    step = jax.jit(
        make_train_step(model, tx, dict(cfg.train_cfg)), donate_argnums=(0,)
    )
    n_steps = 0
    for epoch in range(30):
        loader.set_epoch(epoch)
        for raw in loader:
            state, _ = step(state, to_dev(raw))
            n_steps += 1
        if n_steps >= 96:
            break
    state = recompute_batch_stats(model, state, [first])
    print(f"[train] {n_steps} steps done", flush=True)

    eval_cfg = dict(cfg.data["train"])
    eval_cfg.update(num_frames=n_frames, num_points=n_points)
    eval_cfg["pipeline"] = [dict(type="Reformat")]
    eval_ds = build_dataset({**eval_cfg, "test_mode": True})
    eval_loader = DataLoader(
        eval_ds, batch_size=bs, shuffle=False, num_workers=1,
        max_points=max_points, drop_last=False,
    )
    eval_batches = [
        (jnp.asarray(b["points"]), jnp.asarray(b["points_mask"]),
         b["metadata"])
        for b in eval_loader
    ]
    calib = [(p, m) for p, m, _ in eval_batches[:2]]

    import tempfile

    def m_ap(infer, tag):
        detections = {}
        for pts, msk, metas in eval_batches:
            det = infer(state.params, state.batch_stats, pts, msk)
            for s in detections_to_host(det, metas):
                detections[s["metadata"]["token"]] = s
        with tempfile.TemporaryDirectory() as out:
            result, _ = eval_ds.evaluation(detections, output_dir=out)
        return result["detail"]["demo"]["mAP"]

    fp = m_ap(make_infer_fn(model), "fp")
    print(f"[fp] mAP {fp:.4f}", flush=True)

    def scope_model(name):
        c = Config.fromfile(CFG_PATH)
        if name == "default":
            enable_backbone_quant(c.model)
        elif name == "+head":
            enable_backbone_quant(c.model, head=True)
        elif name == "head_only":
            c.model["bbox_head"]["quant"] = True
        return build_model_from_cfg(c)

    for scope in ("default", "+head", "head_only"):
        mq = scope_model(scope)
        for reduce in ("max", "mean"):
            vq = calibrate(
                mq,
                {"params": state.params, "batch_stats": state.batch_stats},
                calib, reduce=reduce,
            )
            q = m_ap(make_infer_fn(mq, quant=vq["quant"]),
                     f"{scope}_{reduce}")
            print(f"[{scope}/{reduce}] mAP {q:.4f} (delta "
                  f"{q - fp:+.4f})", flush=True)


if __name__ == "__main__":
    main()
