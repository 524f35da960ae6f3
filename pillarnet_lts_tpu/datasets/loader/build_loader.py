"""Threaded data loader (CPU pipeline -> padded numpy batches).

Replaces the reference torch DataLoader + DistributedGroupSampler stack
(`det3d/datasets/loader/build_loader.py:23-57`, `loader/sampler.py`): a
thread pool runs the numpy pipeline (the reference used worker *processes*
because of the GIL-heavy torch pipeline; the numpy pipeline here releases
the GIL in its hot ops), batches are collated with static-shape padding,
and multi-host sharding is index-striped by `jax.process_index()` — the
TPU-native counterpart of DistributedSampler.
"""

import queue
import threading

import numpy as np

from ...parallel.collate import collate_batch


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size,
        shuffle=False,
        num_workers=2,
        max_points=None,
        seed=0,
        drop_last=True,
        num_shards=1,
        shard_index=0,
        prefetch=4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.max_points = max_points
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch):
        """DistSamplerSeedHook equivalent (`hooks/sampler_seed.py`)."""
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (DistributedSampler equivalent): pad to equal length
        if self.num_shards > 1:
            per = -(-len(idx) // self.num_shards)
            total = per * self.num_shards
            idx = np.concatenate([idx, idx[: total - len(idx)]])
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        indices = self._indices()
        nb = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]

        q = queue.Queue(maxsize=self.prefetch)
        batch_iter = iter(batches)
        lock = threading.Lock()
        sentinel = object()
        counters = {"produced": 0}

        stop = {"flag": False}

        def worker():
            # a worker that dies for ANY reason must still put its sentinel
            # (or the exception), otherwise __iter__ blocks on q.get forever
            # — one corrupt sample would silently stall the whole run
            try:
                while not stop["flag"]:
                    with lock:
                        batch_idx = next(batch_iter, None)
                    if batch_idx is None:
                        return
                    items = [self.dataset[i] for i in batch_idx]
                    q.put(collate_batch(items, max_points=self.max_points))
            except BaseException as e:  # noqa: BLE001 — re-raised on main
                q.put(e)
            finally:
                q.put(sentinel)

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        finished = 0
        yielded = 0
        try:
            while finished < len(threads) and yielded < nb:
                item = q.get()
                if item is sentinel:
                    finished += 1
                    continue
                if isinstance(item, BaseException):
                    raise RuntimeError(
                        "data loader worker failed"
                    ) from item
                yielded += 1
                yield item
        finally:
            # abandoned iterator (caller broke out early, e.g. calibration
            # loops / next(iter(loader))): tell workers to stop and drain
            # the queue so none stays blocked on q.put holding a batch
            stop["flag"] = True
            while finished < len(threads):
                if q.get() is sentinel:
                    finished += 1


def build_dataloader(dataset, batch_size, workers_per_gpu, shuffle=True,
                     max_points=None, **kwargs):
    """Reference-compatible entry (`build_loader.py:23`)."""
    import jax

    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        num_workers=workers_per_gpu,
        max_points=max_points,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        **kwargs,
    )
