"""Latency-hiding inference pipeline.

On a chip behind a network relay (or any dispatch-latency-bound link), a
sync-per-frame loop pays the full round trip per frame: this environment's
relay floor is ~28 ms, capping serial bs=1 throughput at ~35 FPS no matter
how fast the compute is. Keeping a few frames in flight overlaps dispatch
latency with device compute — measured 11.4 FPS serial -> 15.2 FPS at
depth 4 for PillarNet-34 (docs/ROADMAP.md).

`ServingPipeline` wraps any jitted inference callable: submissions dispatch
asynchronously (JAX's native async dispatch), results are synced to host in
submission order once more than `depth` calls are outstanding. The
reference has no serving analog (its eval loop syncs per batch,
`tools/dist_test.py:146-157`); this is the TPU-native serving shape.
"""

from collections import deque

import jax


class ServingPipeline:
    """Order-preserving bounded-depth inference pipeline.

    infer_fn: callable returning device arrays (typically a jax.jit).
    depth: max submissions in flight before the oldest is synced; 4
      saturates the measured relay (deeper queues measure the same).
    """

    def __init__(self, infer_fn, depth=4):
        assert depth >= 1
        self.infer_fn = infer_fn
        self.depth = depth
        self._pending = deque()

    def __len__(self):
        return len(self._pending)

    def submit(self, *args, **kwargs):
        """Dispatch one call; returns the OLDEST completed host result once
        the queue exceeds `depth`, else None."""
        self._pending.append(self.infer_fn(*args, **kwargs))
        if len(self._pending) > self.depth:
            return jax.device_get(self._pending.popleft())
        return None

    def drain(self):
        """Sync and yield all outstanding results in submission order."""
        while self._pending:
            yield jax.device_get(self._pending.popleft())

    def map(self, arg_tuples):
        """Pipeline over an iterable of argument tuples; yields host
        results in submission order."""
        for args in arg_tuples:
            out = self.submit(*args)
            if out is not None:
                yield out
        yield from self.drain()
