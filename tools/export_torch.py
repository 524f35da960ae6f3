"""Export a native checkpoint to a reference-format torch .pth.

Usage:
  python tools/export_torch.py --checkpoint DIR --out model.pth
      [--spconv-layout KRSC|RSCK]

The inverse of ``tools/convert_torch.py``: writes a torch state_dict in the
reference's exact module naming and weight layouts (derived from the
checkpoint's own tree — no config needed), loadable by the reference's
``load_checkpoint`` (``det3d/torchie/trainer/checkpoint.py``) for
cross-validation of trained models in the original framework.

DIR is either a training checkpoint (``work_dirs/.../epoch_N``, a saved
TrainState) or a bare-variables directory from ``convert_torch.py``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", required=True, help="output .pth path")
    parser.add_argument("--spconv-layout", default="KRSC",
                        choices=("KRSC", "RSCK"))
    args = parser.parse_args()

    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    import orbax.checkpoint as ocp
    import torch

    from pillarnet_lts_tpu.runtime.torch_convert import export_state_dict

    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(args.checkpoint))
    if "params" not in restored:
        raise ValueError(f"{args.checkpoint} has no params collection")
    variables = {"params": restored["params"],
                 "batch_stats": restored.get("batch_stats", {})}
    sd = export_state_dict(variables, spconv_layout=args.spconv_layout)
    torch.save(
        {"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()},
         "meta": {"exported_from": os.path.abspath(args.checkpoint)}},
        args.out,
    )
    print(f"exported {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
