"""Export the full inference graph as a self-contained StableHLO artifact.

Usage:
  python tools/export_serving.py CONFIG --checkpoint DIR --out model.jaxexp
      [--batch 1] [--max-points 300000] [--platform tpu|cpu]

Serializes the jitted end-to-end inference function (points -> decoded,
NMS'd boxes; weights baked in as constants) with `jax.export`.  The
artifact is loadable in any process with jax installed — no framework, no
config, no checkpoint:

    from jax import export
    fn = export.deserialize(open("model.jaxexp", "rb").read())
    dets = fn.call(points, points_mask)   # {'box3d_lidar', 'scores', ...}

This is the TPU-native analog of the reference's torchscript/ONNX-style
deployment gap (the reference has none — serving reuses the training
stack); a frozen, version-pinned compute graph is the serving contract for
production fleets.  The export targets the requested platform's lowering;
cross-platform export (e.g. export on a CPU host, serve on TPU) is
supported by jax.export as long as the ops lower on the target.

Multi-chip serving recipe (the deployment behind BASELINE.md's 2-chip
resolution of the >= 40 FPS north star). The serving graph has NO
cross-chip collectives — every frame is independent — so the scaling
unit is the chip and there are two equivalent deployments:

  1. replicate-per-chip (recommended, fault-isolated): export ONE
     artifact at the measured amortization optimum (`--batch 8 --int8`
     for the flagship; BENCH r4/r5), load it once per chip
     (`jax.device_put` the deserialized call's inputs per device, or one
     process per chip), and round-robin frames. Fleet throughput is
     per-chip FPS x n_chips by construction.
  2. single-process dp-sharded: build the mesh (`parallel/mesh.py`),
     shard the batch axis over 'dp', replicate params, and jit the same
     infer fn — validated every round by `__graft_entry__.
     dryrun_multichip` ("serving_shard=ok", 2N frames over N devices).

Per-chip batch stays 8 either way (bs=12 measured SLOWER per frame —
docs/ROADMAP.md round 4); scale chips, not batch.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config")
    parser.add_argument("--checkpoint", required=True,
                        help="orbax checkpoint dir (TrainState or bare "
                             "variables, e.g. convert_torch.py output)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--max-points", type=int, default=None,
                        help="points-per-frame padding (default: the "
                             "config's data.max_points)")
    parser.add_argument("--platform", default=None,
                        choices=(None, "cpu", "tpu"),
                        help="lowering platform (default: the current "
                             "jax backend)")
    parser.add_argument("--int8", action="store_true",
                        help="bake the int8-quantized backbone into the "
                             "artifact (calibrates on --calib-batches val "
                             "frames; see runtime/quantize.py)")
    parser.add_argument("--calib-batches", type=int, default=8)
    args = parser.parse_args()

    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    from pillarnet_lts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from jax import export as jexport

    from pillarnet_lts_tpu.apis import build_model_from_cfg
    from pillarnet_lts_tpu.eval_utils import make_infer_fn
    from pillarnet_lts_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    if args.int8:
        from pillarnet_lts_tpu.runtime.quantize import enable_backbone_quant

        enable_backbone_quant(cfg.model)
    model = build_model_from_cfg(cfg)
    n_pts = args.max_points or cfg.data.get("max_points") or 300_000

    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(args.checkpoint))
    params = restored["params"]
    batch_stats = restored.get("batch_stats", {})

    quant = None
    if args.int8:
        from pillarnet_lts_tpu.datasets import build_dataset
        from pillarnet_lts_tpu.datasets.loader import build_dataloader
        from pillarnet_lts_tpu.runtime.quantize import calibrate

        loader = build_dataloader(
            build_dataset(cfg.data["val"]), batch_size=1,
            workers_per_gpu=0, shuffle=False,
            max_points=cfg.data.get("max_points"), drop_last=False,
        )
        calib = []
        for j, b in enumerate(loader):
            calib.append((jnp.asarray(b["points"]),
                          jnp.asarray(b["points_mask"])))
            if j + 1 >= args.calib_batches:
                break
        print(f"int8: calibrating on {len(calib)} batches")
        quant = calibrate(
            model, {"params": params, "batch_stats": batch_stats}, calib
        )["quant"]

    infer = make_infer_fn(model, quant=quant)

    def serving_fn(points, points_mask):
        return infer(params, batch_stats, points, points_mask)

    spec_pts = jax.ShapeDtypeStruct((args.batch, n_pts, 5), jnp.float32)
    spec_msk = jax.ShapeDtypeStruct((args.batch, n_pts), jnp.bool_)
    platforms = [args.platform] if args.platform else None
    exported = jexport.export(
        jax.jit(serving_fn), platforms=platforms)(spec_pts, spec_msk)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB to {args.out} "
          f"(batch={args.batch}, points={n_pts}, "
          f"platforms={exported.platforms})")


if __name__ == "__main__":
    main()
