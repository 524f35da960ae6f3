"""Model introspection CLI: parameter count + XLA cost analysis.

Equivalent of the reference startup prints (`get_model_params`,
`torchie/apis/env.py:95`) and the hook-based `flops_counter.py` — exact
compiler numbers instead of per-module estimates.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--points", type=int, default=None,
                        help="override max_points for the analysis")
    args = parser.parse_args()

    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    import jax.numpy as jnp

    from __graft_entry__ import _synth_points
    from pillarnet_lts_tpu.apis import build_model_from_cfg
    from pillarnet_lts_tpu.utils.config import Config
    from pillarnet_lts_tpu.utils.profiling import cost_analysis, count_params

    cfg = Config.fromfile(args.config)
    model = build_model_from_cfg(cfg)
    n = args.points or cfg.data.get("max_points", 65536)
    pts, mask = _synth_points(1, n, cfg.point_cloud_range)
    pts, mask = jnp.asarray(pts), jnp.asarray(mask)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)

    print(f"parameters: {count_params(variables['params']) / 1e6:.2f}M")

    def fwd(v, p, m):
        return model.apply(v, p, m, train=False)

    costs = cost_analysis(fwd, variables, pts, mask)
    if costs:
        flops = costs.get("flops", float("nan"))
        print(f"forward flops: {flops / 1e9:.1f} GFLOP")
        ba = costs.get("bytes accessed", None)
        if ba is not None:
            print(f"bytes accessed: {ba / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
