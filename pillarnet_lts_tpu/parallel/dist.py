"""Cross-host collectives for host-side python objects.

TPU-native equivalent of the reference's pickle-tensor eval gather and
barrier (`det3d/torchie/trainer/utils.py:99-141`: `synchronize()` +
`all_gather(detections)` used by `trainer.py:475` / `tools/dist_test.py:187`).
Device arrays ride compiler collectives; *host objects* (per-sample
detection dicts keyed by token) are pickled, padded to the max byte length
across hosts, and exchanged with `multihost_utils.process_allgather`.

Single-process (including the virtual 8-device CPU mesh) short-circuits to
identity, so the same call sites work everywhere.
"""

import pickle

import jax
import numpy as np


def process_count() -> int:
    try:
        return jax.process_count()
    except Exception:
        return 1


def sync_global_devices(name: str) -> None:
    """Cross-host barrier (`utils.py:99-112` synchronize())."""
    if process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_gather_objects(obj):
    """Gather one python object per host; returns a list with process_count
    entries ordered by process index (`utils.py:114-141` all_gather).

    The object is pickled to bytes, zero-padded to the global max length
    (process_allgather requires equal shapes), and reassembled using the
    true per-host lengths.
    """
    n = process_count()
    if n <= 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    local_len = np.array([len(payload)], dtype=np.int64)
    all_lens = np.asarray(multihost_utils.process_allgather(local_len))
    all_lens = all_lens.reshape(-1)
    max_len = int(all_lens.max())

    buf = np.zeros((max_len,), dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(n, max_len)

    return [
        pickle.loads(gathered[i, : int(all_lens[i])].tobytes())
        for i in range(n)
    ]


def merge_detection_dicts(per_host_dicts):
    """Union of per-host {token: sample} maps (`dist_test.py:193-199`)."""
    merged = {}
    for d in per_host_dicts:
        merged.update(d)
    return merged
