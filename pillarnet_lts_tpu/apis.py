"""High-level train/eval entry points.

Equivalent of `det3d/torchie/apis/train.py:255-326` ``train_detector``:
build loaders, optimizer (+ one-cycle schedule over the full step budget),
trainer + hooks, optional resume, run. DDP wrapping / apex syncBN disappear:
the mesh + jit sharding in the Trainer subsume both.
"""

import logging

from .datasets.loader import build_dataloader
from .models import build_detector
from .runtime import CheckpointHook, IterTimerHook, TextLoggerHook, Trainer
from .solver import build_optimizer


def build_model_from_cfg(cfg):
    model_cfg = dict(cfg.model)
    try:
        import jax

        per_dev = max(
            1, int(cfg.data["samples_per_gpu"]) // jax.device_count()
        )
        default_remat_policy(model_cfg, per_dev)
    except Exception:
        pass  # eval-only configs without a data section
    return build_detector(
        model_cfg, train_cfg=cfg.train_cfg, test_cfg=cfg.test_cfg
    )


def optimizer_from_cfg(cfg, total_steps=1):
    """Gradient transformation for a config. Checkpoint restore requires a
    structurally identical opt_state, so every consumer (train, eval restore
    skeletons) must build through here — grad-clip and freeze masking both
    change the optax chain structure."""
    grad_clip = None
    if cfg.get("optimizer_config") and cfg.optimizer_config.get("grad_clip"):
        grad_clip = cfg.optimizer_config["grad_clip"]["max_norm"]
    frozen = ()
    if cfg.model.get("type") == "PillarRCNN" and cfg.model.get("freeze"):
        frozen = ("single_det",)
    return build_optimizer(cfg.optimizer, cfg.lr_config, total_steps,
                           grad_clip, frozen_prefixes=frozen)


def apply_pretrained(trainer, model_cfg, logger=None):
    """Consume `pretrained` config fields (reference `single_stage.py:31-38`
    init_weights + the Pillar R-CNN stage-1 bootstrap `pillar_rcnn.py:20-23`):

    - model.pretrained          -> non-strict load into the whole model
    - model.first_stage_cfg.pretrained -> load a PillarNet checkpoint into
      PillarRCNN's `single_det` subtree (typically combined with freeze=True).

    Like the reference, a missing/unreadable checkpoint logs a warning and
    training proceeds from random init.
    """
    import jax as _jax

    from .parallel.mesh import replicate
    from .runtime.checkpoint import load_pretrained

    logger = logger or logging.getLogger("train")
    specs = []
    if model_cfg.get("pretrained"):
        specs.append((model_cfg["pretrained"], None))
    first_stage = model_cfg.get("first_stage_cfg") or {}
    if first_stage.get("pretrained"):
        specs.append((first_stage["pretrained"], "single_det"))
    if not specs:
        return

    variables = {
        "params": _jax.device_get(trainer.state.params),
        "batch_stats": _jax.device_get(trainer.state.batch_stats),
    }
    for path, subtree in specs:
        try:
            if str(path).endswith((".pth", ".pt")):
                # reference torch checkpoint: convert in place (numerics
                # pinned by tests/test_torch_convert.py). Only whole-model
                # loads are supported this way; for the R-CNN stage-1
                # bootstrap convert to orbax first (tools/convert_torch.py).
                from .runtime.torch_convert import (
                    convert_state_dict, load_torch_state_dict)

                if subtree is not None:
                    raise ValueError(
                        "subtree loads from .pth are not supported; run "
                        "tools/convert_torch.py first")
                variables, rep = convert_state_dict(
                    load_torch_state_dict(path), variables, strict=False)
                logger.info(
                    "converted torch checkpoint %s (%d leaves, %d missing)",
                    path, len(rep["converted"]), len(rep["missing"]))
            else:
                variables, _ = load_pretrained(
                    variables, path, subtree=subtree, logger=logger
                )
            logger.info("init weight from %s", path)
        except Exception as e:  # parity: reference swallows and proceeds
            logger.warning("no pretrained model at %s (%s)", path, e)
    trainer.state = replicate(
        trainer.state.replace(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
        ),
        trainer.mesh,
    )


def default_remat_policy(model_cfg, per_device_batch):
    """Auto-select the remat policy for mid-size batches (measured, round
    3/4): at 2 <= bs < 8 per device the un-W-tiled training convs trigger
    XLA's space-to-batch pass, whose fp32 BN temps make full-replay remat
    crawl (bs=4: 2272 ms/step full replay vs 1298 ms with
    remat_policy='conv_out'); bs=8 avoids the pathology and full replay is
    the better memory trade there (conv outputs alone need ~30 GB at
    bs=8). Only applies when remat is on and no policy was configured."""
    bb = model_cfg.get("backbone") if isinstance(model_cfg, dict) else None
    if (isinstance(bb, dict) and bb.get("remat")
            and "remat_policy" not in bb
            and 2 <= per_device_batch < 8):
        bb["remat_policy"] = "conv_out"
    return model_cfg


def train_detector(model, dataset, cfg, logger=None, resume_from=None):
    logger = logger or logging.getLogger("train")

    data_cfg = cfg.data
    loader = build_dataloader(
        dataset,
        batch_size=data_cfg["samples_per_gpu"],
        workers_per_gpu=data_cfg["workers_per_gpu"],
        shuffle=True,
        max_points=data_cfg.get("max_points", None),
    )

    total_epochs = cfg.total_epochs
    total_steps = total_epochs * len(loader)
    tx = optimizer_from_cfg(cfg, total_steps)

    trainer = Trainer(
        model,
        tx,
        dict(cfg.train_cfg),
        cfg.work_dir,
        logger=logger,
        cfg_text=cfg.text,
        class_names=list(getattr(cfg, "class_names", []) or []),
    )

    # initialize parameters from the first batch's shapes
    first_batch = next(iter(loader))
    trainer.init_state(first_batch)
    apply_pretrained(trainer, cfg.model, logger)

    log_interval = 10
    if cfg.get("log_config"):
        log_interval = cfg.log_config.get("interval", 10)
    trainer.register_hook(IterTimerHook())
    trainer.register_hook(TextLoggerHook(interval=log_interval, logger=logger))
    ckpt_interval = 1
    if cfg.get("checkpoint_config"):
        ckpt_interval = cfg.checkpoint_config.get("interval", 1)
    trainer.register_hook(CheckpointHook(interval=ckpt_interval))

    if resume_from:
        trainer.resume(resume_from)

    trainer.run(loader, total_epochs)
    return trainer
