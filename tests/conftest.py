import os
import sys

# the package is not pip-installed: make the suite runnable from any cwd
# (pillarnet_lts_tpu + repo-root modules like bench.py / __graft_entry__.py)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4 test strategy).
#
# The environment's sitecustomize force-registers a TPU PJRT plugin and
# overrides JAX_PLATFORMS, so the env var alone is not enough — the config
# must be updated explicitly before the first backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
