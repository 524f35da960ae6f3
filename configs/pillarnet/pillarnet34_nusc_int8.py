"""PillarNet-34 nuScenes, int8-quantized backbone deploy configuration.

The bf16 serving config with the backbone conv cores switched to the int8
deploy path (post-training quantization; see `models/backbones/base.py`
and `runtime/quantize.py`). Calibrate activation scales before serving:
`tools/dist_test.py --int8` does it inline; `tools/export_serving.py
--int8` bakes them into the StableHLO artifact. Checkpoints are identical
to the bf16 config's.
"""

import os as _os

with open(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "pillarnet34_nusc_bf16.py")) as _f:
    exec(_f.read())

model["backbone"]["quant"] = True  # noqa: F821
