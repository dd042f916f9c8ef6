"""Checkpoint-interrupt resume equivalence: training E epochs straight
must equal training 1 epoch, restarting the process state from the
checkpoint, and training the remaining epochs — for deterministic data
(augmentation RNG streams are epoch-seeded; host-mode RandomState
continuation across restarts is a documented deviation, PARITY.md)."""

import jax
import numpy as np

from awr_tpu.config import Config
from awr_tpu.data.synthetic import SyntheticHandDataset
from awr_tpu.training.trainer import Trainer


def _cfg(**kw):
    base = dict(net="resnet_18", kernel_size=1.0, img_size=64,
                batch_size=4, vis_freq=0, use_pallas=False,
                print_freq=1000, max_epoch=2, optimizer="sgd", lr=1e-3)
    base.update(kw)
    return Config(**base)


def _data():
    # phase='test' as training data: deterministic (no augmentation RNG)
    train = SyntheticHandDataset(8, 14, 64, phase="test", seed=0)
    train.phase = "train"
    train.val = True  # val=True disables augmentation (reference :53)
    test = SyntheticHandDataset(4, 14, 64, phase="test", seed=1)
    return train, test


def _params(tr):
    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(tr.state.params)]


def test_resume_equals_straight_run(tmp_path):
    train, test = _data()
    tr_a = Trainer(_cfg(), train, test, workdir=str(tmp_path / "a"))
    tr_a.train()  # 2 epochs straight
    pa = _params(tr_a)
    tr_a.close()

    train, test = _data()
    tr_b = Trainer(_cfg(max_epoch=1), train, test,
                   workdir=str(tmp_path / "b"))
    tr_b.train()  # 1 epoch, checkpointed
    tr_b.close()
    train, test = _data()
    tr_c = Trainer(_cfg(max_epoch=2), train, test,
                   workdir=str(tmp_path / "b"))  # auto-restores epoch 1
    assert tr_c.best_records["epoch"] == 1
    tr_c.train()  # epoch 2 only
    pc = _params(tr_c)
    tr_c.close()

    for a, c in zip(pa, pc):
        np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-7)
