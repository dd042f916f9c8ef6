"""PrefetchLoader tests: ordering, completeness, error propagation."""

import numpy as np
import pytest

from awr_tpu.data.pipeline import PrefetchLoader


class ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i == -1:
            raise ValueError("boom")
        return {"x": np.full((2, 2), i, np.float32),
                "i": np.asarray(i, np.int64)}


def test_order_and_completeness():
    ds = ToyDataset(10)
    loader = PrefetchLoader(ds, 3, num_workers=3)
    seen = []
    for batch in loader:
        seen.extend(batch["i"].tolist())
    assert seen == list(range(10))
    assert len(loader) == 4


def test_shuffle_deterministic_given_rng():
    ds = ToyDataset(8)
    a = [b["i"].tolist() for b in PrefetchLoader(
        ds, 4, shuffle=True, rng=np.random.RandomState(3))]
    b = [b["i"].tolist() for b in PrefetchLoader(
        ds, 4, shuffle=True, rng=np.random.RandomState(3))]
    assert a == b
    flat = [i for bb in a for i in bb]
    assert sorted(flat) == list(range(8))


def test_drop_last():
    ds = ToyDataset(10)
    loader = PrefetchLoader(ds, 4, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert all(len(b["i"]) == 4 for b in batches)


def test_worker_error_propagates():
    class Bad(ToyDataset):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return super().__getitem__(i)

    loader = PrefetchLoader(Bad(8), 2, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader)
