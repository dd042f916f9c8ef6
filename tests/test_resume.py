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


# ---------------------------------------------------------------------
# Multi-host checkpoint TOPOLOGY-CHANGE resume (VERDICT r4 next-7):
# save under N processes, resume under M != N — the Orbax sharding-
# metadata trap every pod deployment hits on its first resize.  The
# framework's CheckpointManager host-materializes before saving, which
# is what makes the artifact topology-portable; these tests prove that
# contract across REAL jax.distributed process boundaries.
# ---------------------------------------------------------------------

def _run_topology_children(tmp_path, nproc, phase, ckpt_dir, tag):
    """Launch ``nproc`` jax.distributed child processes over the same 4
    global CPU devices; returns their parsed result dicts."""
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        coord = f"localhost:{s.getsockname()[1]}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "multihost_topology_child.py")
    ndev_local = 4 // nproc
    env = dict(os.environ,
               XLA_FLAGS=f"--xla_force_host_platform_device_count="
                         f"{ndev_local}",
               PYTHONPATH=repo + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    outs = [str(tmp_path / f"{tag}_p{i}.json") for i in range(nproc)]
    procs = [subprocess.Popen(
        [sys.executable, child, coord, str(nproc), str(i), outs[i],
         str(ckpt_dir), phase],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nproc)]
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"{tag}: {log[-3000:]}"
    return [json.load(open(o)) for o in outs]


def _assert_matches_control(results, control, *, rtol=1e-4):
    for r in results:
        np.testing.assert_allclose(r["losses"], control["losses"][2:],
                                   rtol=1e-5)
        for part in ("params", "stats"):
            assert r[part].keys() == control[part].keys()
            for k in control[part]:
                np.testing.assert_allclose(
                    r[part][k], control[part][k], rtol=rtol, atol=1e-6,
                    err_msg=f"{part}:{k}")


def test_checkpoint_topology_change_resume(tmp_path):
    """Save under 2 processes -> resume under 1, and save under 1 ->
    resume under 2: both must reproduce the uninterrupted control's
    step-3/4 losses and final params/BN fingerprints."""
    control = _run_topology_children(
        tmp_path, 1, "full", tmp_path / "unused", "control")[0]
    assert len(control["losses"]) == 4

    # 2-process save -> 1-process resume
    ck21 = tmp_path / "ck21"
    savers = _run_topology_children(tmp_path, 2, "save", ck21, "save2")
    for r in savers:
        np.testing.assert_allclose(r["losses"], control["losses"][:2],
                                   rtol=1e-5)
    resumed = _run_topology_children(tmp_path, 1, "resume", ck21,
                                     "resume1")
    _assert_matches_control(resumed, control)

    # 1-process save -> 2-process resume
    ck12 = tmp_path / "ck12"
    _run_topology_children(tmp_path, 1, "save", ck12, "save1")
    resumed = _run_topology_children(tmp_path, 2, "resume", ck12,
                                     "resume2")
    _assert_matches_control(resumed, control)
    # and the two resumed processes agree exactly with each other
    assert resumed[0]["params"] == resumed[1]["params"]
    assert resumed[0]["stats"] == resumed[1]["stats"]
