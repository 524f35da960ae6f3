"""Convert a reference PyTorch checkpoint to a native checkpoint.

Usage:
  python tools/convert_torch.py CONFIG --ckpt ref_model.pth --out DIR
      [--spconv-layout KRSC|RSCK] [--non-strict]

CONFIG is the matching config from ``configs/`` (the same model the torch
checkpoint was trained with — e.g. ``configs/pillarnet/pillarnet34_nusc.py``
for the reference's released nuScenes PillarNet-34).  The output directory
is an orbax checkpoint holding the bare ``{'params', 'batch_stats'}``
variables, directly usable as:

  * ``pretrained="DIR"`` in any model config (finetune / eval bootstrap,
    consumed by ``runtime/checkpoint.py::load_pretrained``);
  * ``--checkpoint DIR`` for ``tools/dist_test.py``.

Replaces the reference's torch-native checkpoint reuse
(``det3d/torchie/trainer/checkpoint.py:166-219``) for users migrating
trained weights to this framework.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("--ckpt", required=True, help="torch .pth checkpoint")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--spconv-layout", default="KRSC",
                        choices=("KRSC", "RSCK"),
                        help="fallback spconv weight layout (2.x = KRSC); "
                             "auto-detected when shapes allow")
    parser.add_argument("--non-strict", action="store_true",
                        help="allow missing sources (left at init values)")
    args = parser.parse_args()

    import jax

    # honor an explicit platform request even under a sitecustomize that
    # force-registers a TPU plugin and overrides the env var
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from pillarnet_lts_tpu.models.builder import build_detector
    from pillarnet_lts_tpu.runtime.torch_convert import (
        convert_state_dict, load_torch_state_dict)
    from pillarnet_lts_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    two_stage = cfg.model["type"] in ("PillarRCNN", "TwoStageDetector")
    model = build_detector(
        cfg.model,
        train_cfg=cfg.get("train_cfg"), test_cfg=cfg.get("test_cfg"),
    )
    reader_cfg = (cfg.model.get("first_stage_cfg") or cfg.model)["reader"]
    pts = jnp.zeros((1, 32, reader_cfg["in_channels"]), jnp.float32)
    msk = jnp.ones((1, 32), bool)
    if two_stage:
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(1)},
            pts, msk, jnp.zeros((1, 8, 10), jnp.float32), train=True,
        )
    else:
        variables = model.init(jax.random.PRNGKey(0), pts, msk, train=False)

    state_dict = load_torch_state_dict(args.ckpt)
    converted, report = convert_state_dict(
        state_dict, jax.device_get(variables),
        strict=not args.non_strict, spconv_layout=args.spconv_layout)

    print(f"converted {len(report['converted'])} leaves "
          f"({len(report['missing'])} missing, "
          f"{len(report['unmapped'])} unmapped, "
          f"{len(report['unused'])} unused torch keys)")
    for k in report["unused"][:10]:
        print(f"  unused: {k}")

    out = os.path.abspath(args.out)
    ocp.PyTreeCheckpointer().save(out, converted, force=True)
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({
            "format": "variables",
            "source": os.path.abspath(args.ckpt),
            "config": os.path.abspath(args.config),
            "converted": len(report["converted"]),
            "missing": len(report["missing"]),
            "unused": len(report["unused"]),
        }, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
