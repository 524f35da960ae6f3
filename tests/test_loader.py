"""DataLoader behavior: sharding arithmetic and worker-failure propagation
(a dying worker must surface its exception instead of hanging __iter__)."""

import numpy as np
import pytest

from pillarnet_lts_tpu.datasets.loader.build_loader import DataLoader


class _ToyDataset:
    def __init__(self, n=16, poison=None):
        self.n = n
        self.poison = poison

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.poison is not None and i == self.poison:
            raise ValueError(f"corrupt sample {i}")
        return {
            "points": np.full((4, 5), float(i), np.float32),
            "metadata": {"token": str(i)},
        }


def test_loader_yields_all_batches():
    loader = DataLoader(_ToyDataset(16), batch_size=4, shuffle=False,
                        num_workers=3, max_points=8)
    batches = list(loader)
    assert len(batches) == len(loader) == 4
    seen = sorted(
        float(b["points"][j, 0, 0]) for b in batches for j in range(4)
    )
    assert seen == [float(i) for i in range(16)]


def test_loader_worker_failure_raises_instead_of_hanging():
    loader = DataLoader(_ToyDataset(16, poison=5), batch_size=4,
                        shuffle=False, num_workers=2, max_points=8)
    with pytest.raises(RuntimeError, match="worker failed") as exc_info:
        list(loader)
    assert "corrupt sample 5" in str(exc_info.value.__cause__)


def test_loader_shards_pad_to_equal_length():
    full = DataLoader(_ToyDataset(10), batch_size=1, shuffle=False,
                      num_workers=1, max_points=8)
    shards = [
        DataLoader(_ToyDataset(10), batch_size=1, shuffle=False,
                   num_workers=1, max_points=8, num_shards=4, shard_index=i)
        for i in range(4)
    ]
    assert len(full) == 10
    assert all(len(s) == 3 for s in shards)  # ceil(10/4) with wrap padding
