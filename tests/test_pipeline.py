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


class TestPrefetchToDevice:
    def test_order_and_values(self):
        from awr_tpu.data.pipeline import prefetch_to_device

        out = list(prefetch_to_device(iter(range(20)),
                                      lambda x: x * 2, depth=3))
        assert out == [x * 2 for x in range(20)]

    def test_depth_zero_inline(self):
        from awr_tpu.data.pipeline import prefetch_to_device

        seen = []
        gen = prefetch_to_device(iter([1, 2, 3]), seen.append, depth=0)
        assert next(gen) is None and seen == [1]  # staged lazily

    def test_stage_exception_propagates(self):
        from awr_tpu.data.pipeline import prefetch_to_device

        def bad(x):
            if x == 2:
                raise RuntimeError("boom")
            return x

        gen = prefetch_to_device(iter(range(5)), bad, depth=2)
        assert next(gen) == 0
        assert next(gen) == 1
        with pytest.raises(RuntimeError, match="boom"):
            list(gen)

    def test_abandon_stops_thread(self):
        import threading

        from awr_tpu.data.pipeline import prefetch_to_device

        n0 = threading.active_count()
        gen = prefetch_to_device(iter(range(1000)), lambda x: x, depth=1)
        assert next(gen) == 0
        gen.close()  # abandon mid-stream
        import time

        for _ in range(50):  # thread should exit promptly
            if threading.active_count() <= n0:
                break
            time.sleep(0.1)
        assert threading.active_count() <= n0


def test_trainer_device_prefetch_equivalence(tmp_path):
    """One epoch with staged prefetch == one with inline staging: the
    batches, order, and RNG are identical, so the params must be."""
    import jax

    from awr_tpu.config import Config
    from awr_tpu.data.synthetic import SyntheticHandDataset
    from awr_tpu.training.trainer import Trainer

    params = []
    for name, depth in (("pf0", 0), ("pf2", 2)):
        cfg = Config(net="resnet_18", img_size=64, batch_size=8,
                     vis_freq=0, use_pallas=False, print_freq=1000,
                     kernel_size=1.0, max_epoch=1,
                     device_prefetch=depth)
        tr = Trainer(
            cfg,
            SyntheticHandDataset(16, cfg.jt_num, cfg.img_size,
                                 phase="train", seed=0),
            SyntheticHandDataset(8, cfg.jt_num, cfg.img_size,
                                 phase="test", seed=1),
            workdir=str(tmp_path / name))
        tr.train()
        params.append(jax.tree_util.tree_map(np.asarray,
                                             tr.state.params))
        tr.close()
    a = jax.tree_util.tree_leaves(params[0])
    b = jax.tree_util.tree_leaves(params[1])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
