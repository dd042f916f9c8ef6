"""End-to-end driver tests: jitted train/eval steps, loss decrease,
checkpoint save/restore, mesh data-parallel equivalence."""

import os

import jax
import numpy as np

from awr_tpu.config import Config
from awr_tpu.data.synthetic import SyntheticHandDataset
from awr_tpu.training.trainer import Trainer

SMALL = dict(img_size=64, batch_size=8, vis_freq=0, use_pallas=False,
             print_freq=1000)


def small_config(**kw):
    base = dict(SMALL, net="resnet_18", kernel_size=1.0)
    base.update(kw)
    return Config(**base)


def make_trainer(tmp_path, **kw):
    cfg = small_config(**kw)
    train = SyntheticHandDataset(8, cfg.jt_num, cfg.img_size,
                                 phase="train", seed=0)
    test = SyntheticHandDataset(8, cfg.jt_num, cfg.img_size,
                                phase="test", seed=1)
    return Trainer(cfg, train, test, workdir=str(tmp_path / "work"))


def test_train_step_decreases_loss(tmp_path):
    tr = make_trainer(tmp_path, lr=3e-4)
    ds = tr.train_data
    batch_raw = next(ds.batches(8))
    batch, _ = tr._pad(batch_raw)
    dev = tr._put(batch)
    losses = []
    for _ in range(30):
        tr.state, m = tr._train_step(tr.state, dev)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # the delta=0.01 dense loss is background-dominated; expect a steady
    # but modest decrease when overfitting one batch
    assert np.mean(losses[-5:]) < losses[0], losses
    tr.close()


def test_eval_and_dump(tmp_path):
    tr = make_trainer(tmp_path)
    mpe, auc = tr.test(epoch=0)
    assert np.isfinite(mpe) and mpe > 0
    dumps = [f for f in os.listdir(tr.work_dir) if f.startswith("test_")
             and f.endswith(".txt")]
    assert dumps, os.listdir(tr.work_dir)
    pcks = [f for f in os.listdir(tr.work_dir) if f.endswith(".png")]
    assert pcks
    tr.close()


def test_checkpoint_roundtrip(tmp_path):
    tr = make_trainer(tmp_path)
    batch, _ = tr._pad(next(tr.train_data.batches(8)))
    dev = tr._put(batch)
    tr.state, _ = tr._train_step(tr.state, dev)
    # best_epoch (epoch of best MPE) is kept separately from the resume
    # cursor 'epoch' and must survive non-improving later epochs
    tr.best_records.update(epoch=3, best_epoch=2, MPE=12.5)
    tr.save(3)
    # saves are async; a DIFFERENT manager (tr2 below) only sees
    # committed steps, so flush the writer before reading
    tr.ckpt.wait()
    p0 = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params)[0])

    tr2 = make_trainer(tmp_path)  # same workdir -> auto-restore
    assert tr2.best_records["epoch"] == 3
    assert tr2.best_records["best_epoch"] == 2
    assert abs(tr2.best_records["MPE"] - 12.5) < 1e-6
    p1 = np.asarray(jax.tree_util.tree_leaves(tr2.state.params)[0])
    np.testing.assert_allclose(p0, p1)
    assert int(tr2.state.step) == 1
    tr.close()
    tr2.close()


def test_async_checkpoint_saves_commit(tmp_path):
    """save() is non-blocking (docs/DESIGN.md section 7): back-to-back
    epoch saves schedule without waiting; wait()/latest_epoch()/restore()
    flush, and the restored tree equals what was saved."""
    from awr_tpu.training.checkpoints import CheckpointManager

    state = {"params": {"w": np.arange(6, dtype=np.float32)},
             "step": np.int64(1)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for e in (1, 2, 3):
        mgr.save(e, dict(state, step=np.int64(e)))  # no block
    assert mgr.latest_epoch() == 3  # waits internally
    out = mgr.restore(3, template=state)
    assert int(out["step"]) == 3
    np.testing.assert_array_equal(out["params"]["w"],
                                  state["params"]["w"])
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr2.latest_epoch() == 3  # committed and visible post-close
    mgr2.close()


def test_mesh_data_parallel_matches_single_device(tmp_path):
    """Same batch, 8-device sharded vs 1-device: identical step results
    (global-view pjit semantics; SURVEY.md section 5.8)."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    # SGD: the update is linear in the gradient, so float reduction-order
    # noise stays O(eps).  (Adam's first step is ~lr*sign(g), which flips
    # by 2*lr wherever a near-zero gradient crosses 0 between orders.)
    cfg_kw = dict(lr=1e-3, seed=5, optimizer="sgd")
    tr1 = make_trainer(tmp_path / "a", mesh_devices=1, **cfg_kw)
    tr8 = make_trainer(tmp_path / "b", mesh_devices=8, **cfg_kw)
    batch, _ = tr1._pad(next(tr1.train_data.batches(8)))
    d1 = tr1._put(batch)
    d8 = tr8._put(batch)
    # AOT-compile both steps so the partitioned HLO is inspectable: the
    # 8-device program must contain the XLA-inserted gradient/BatchNorm
    # all-reduce (collectives come from GSPMD, not host code); the
    # 1-device program must contain none (docs/DESIGN.md section 5).
    c1 = tr1._train_step.lower(tr1.state, d1).compile()
    c8 = tr8._train_step.lower(tr8.state, d8).compile()
    assert "all-reduce" in c8.as_text()
    assert "all-reduce" not in c1.as_text()
    tr1.state, m1 = c1(tr1.state, d1)
    tr8.state, m8 = c8(tr8.state, d8)
    # reduction order differs between sharded and unsharded all-reduces;
    # tolerate float32 accumulation noise only
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-3, atol=1e-7)
    l1 = jax.tree_util.tree_leaves(tr1.state.params)
    l8 = jax.tree_util.tree_leaves(tr8.state.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    tr1.close()
    tr8.close()


def test_raw_mode_eval_matches_host_mode(tmp_path):
    """Device-side preprocessing (raw items) must give the same test MPE
    as the host cv2 pipeline for the same frames and weights."""
    cfg = small_config(img_size=128)
    host = SyntheticHandDataset(6, cfg.jt_num, 128, phase="test", seed=1)
    raw = SyntheticHandDataset(6, cfg.jt_num, 128, phase="test", seed=1,
                               mode="raw")
    tr_h = Trainer(cfg, test_data=host, workdir=str(tmp_path / "h"))
    mpe_h, _ = tr_h.test(epoch=1)
    tr_r = Trainer(cfg, test_data=raw, workdir=str(tmp_path / "r"))
    # same init seed -> same params
    mpe_r, _ = tr_r.test(epoch=1)
    np.testing.assert_allclose(mpe_r, mpe_h, rtol=1e-4)
    tr_h.close()
    tr_r.close()


def test_raw_mode_training_runs(tmp_path):
    cfg = small_config(img_size=128, batch_size=4, max_epoch=1)
    train = SyntheticHandDataset(4, cfg.jt_num, 128, phase="train",
                                 seed=0, mode="raw")
    test = SyntheticHandDataset(4, cfg.jt_num, 128, phase="test", seed=1,
                                mode="raw")
    tr = Trainer(cfg, train, test, workdir=str(tmp_path / "raw"))
    tr.train()
    assert tr.ckpt.latest_epoch() == 1
    tr.close()


def test_padded_batch_loss_matches_unpadded(tmp_path):
    """Mesh-size padding must not change the loss: the (B,) validity
    weights mask duplicate rows exactly."""
    tr = make_trainer(tmp_path, mesh_devices=1)
    tr2 = make_trainer(tmp_path / "b", mesh_devices=8)  # same init seed
    ds = tr.train_data
    items = [ds[i] for i in range(5)]
    batch5 = {k: np.stack([it[k] for it in items]) for k in items[0]}
    b5, _ = tr._pad(batch5)
    b8, n = tr2._pad(batch5)
    assert n == 5 and len(b8["img"]) == 8
    assert b8["w"].tolist() == [1, 1, 1, 1, 1, 0, 0, 0]
    # eval-mode BN uses running stats -> padded eval loss is EXACT
    me5 = tr.state and tr._eval_step(tr.state.params,
                                     tr.state.batch_stats, tr._put(b5))
    me8 = tr2._eval_step(tr2.state.params, tr2.state.batch_stats,
                         tr2._put(b8))
    np.testing.assert_allclose(float(me5["loss"]), float(me8["loss"]),
                               rtol=1e-5)  # f32 reduction-order noise
    # train step: smooth-L1 terms are exactly masked; the remaining
    # difference is train-mode BatchNorm statistics seeing the duplicate
    # rows (only the final partial batch per epoch; see PARITY.md)
    _, m5 = tr._train_step(tr.state, tr._put(b5))
    _, m8 = tr2._train_step(tr2.state, tr2._put(b8))
    np.testing.assert_allclose(float(m5["loss"]), float(m8["loss"]),
                               rtol=1e-2)
    tr.close()
    tr2.close()


def test_step_lr_matches_torch_schedule():
    """lr during 1-based epoch E = base * 0.1^((E-1)//step): epoch 30
    still runs at full lr with the NYU step=30 recipe (the reference
    steps the scheduler at the END of each epoch, train.py:160)."""
    from awr_tpu.training.optim import step_lr

    assert step_lr(1e-3, 1, 30) == 1e-3
    assert step_lr(1e-3, 30, 30) == 1e-3
    assert abs(step_lr(1e-3, 31, 30) - 1e-4) < 1e-12
    assert abs(step_lr(1e-3, 61, 30) - 1e-5) < 1e-15


def test_supervise_all_stacks_vs_reference_mode(tmp_path):
    """supervise_all_stacks=False reproduces the reference's effective
    loss (last stack only, train.py:116-121); True sums all stacks."""
    kw = dict(net="hourglass_2", kernel_size=0.4, batch_size=2,
              img_size=64)
    cfg_all = small_config(supervise_all_stacks=True, **kw)
    cfg_last = small_config(supervise_all_stacks=False, **kw)
    ds = SyntheticHandDataset(2, 14, 64, phase="train", seed=0)
    tr_a = Trainer(cfg_all, ds, workdir=str(tmp_path / "a"))
    tr_l = Trainer(cfg_last, ds, workdir=str(tmp_path / "b"))
    batch, _ = tr_a._pad(next(ds.batches(2)))
    dev = tr_a._put(batch)
    _, m_a = tr_a._train_step(tr_a.state, dev)
    _, m_l = tr_l._train_step(tr_l.state, dev)
    # same init -> all-stack loss strictly exceeds last-stack loss
    assert float(m_a["loss"]) > float(m_l["loss"]) > 0
    tr_a.close()
    tr_l.close()


def test_one_epoch_hourglass_train(tmp_path):
    cfg = small_config(net="hourglass_1", kernel_size=0.4, max_epoch=1,
                       batch_size=4)
    train = SyntheticHandDataset(4, cfg.jt_num, cfg.img_size,
                                 phase="train", seed=0)
    test = SyntheticHandDataset(4, cfg.jt_num, cfg.img_size,
                                phase="test", seed=1)
    tr = Trainer(cfg, train, test, workdir=str(tmp_path / "hg"))
    tr.train()  # one epoch end-to-end incl. test + checkpoint
    assert tr.ckpt.latest_epoch() == 1
    tr.close()


def test_eval_loss_sums_all_stacks(tmp_path):
    """The eval loss must SUM the per-stack coord+offset losses over
    every hourglass stack (reference test.py:74-87) while the decoded
    joints come from the LAST stack (PARITY.md)."""
    import jax.numpy as jnp

    from awr_tpu.ops import smooth_l1_loss
    from awr_tpu.ops.decode import decode_offsets
    from awr_tpu.ops.encode import encode_offsets

    cfg = small_config(net="hourglass_2", kernel_size=0.4, batch_size=2,
                       img_size=64, coord_weight=1.0)
    ds = SyntheticHandDataset(2, 14, 64, phase="test", seed=0)
    tr = Trainer(cfg, test_data=ds, workdir=str(tmp_path / "w"))
    batch, _ = tr._pad(next(ds.batches(2)))
    dev = tr._put(batch)
    m = tr._eval_step(tr.state.params, tr.state.batch_stats, dev)

    img = dev["img"]
    preds = tr.model.apply(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        img[..., None], train=False)
    assert preds.shape[0] == 2  # (S, B, F, F, 4J)
    gt = encode_offsets(dev["jt_uvd"], img, 0.4, cfg.feature_size,
                        use_pallas=False)
    expected = 0.0
    for s in range(2):
        jt = decode_offsets(preds[s], img, 0.4, use_pallas=False)
        expected += (cfg.coord_weight
                     * smooth_l1_loss(jt, dev["jt_uvd"],
                                      sample_weight=dev["w"])
                     + cfg.dense_weight
                     * smooth_l1_loss(preds[s], gt,
                                      sample_weight=dev["w"]))
    np.testing.assert_allclose(float(m["loss"]), float(expected),
                               rtol=1e-6)
    # metrics joints = LAST stack's decode
    last = decode_offsets(preds[-1], img, 0.4, use_pallas=False)
    np.testing.assert_allclose(np.asarray(m["jt_uvd_pred"]),
                               np.asarray(last), rtol=1e-6, atol=1e-7)
    tr.close()


def test_mesh_hourglass_train_matches_single_device(tmp_path):
    """The reference's DEFAULT family (hourglass, reference
    config.py:33) under the 8-device DP mesh == single device, with
    stacked deep supervision active (nstack=2, supervise_all_stacks)
    and cross-replica BatchNorm statistics — VERDICT r3 next-7: the
    resnet-only mesh test left the flagship's mesh behavior unproven.
    SGD so the comparison is not drowned by Adam sign-noise (see
    test_mesh_data_parallel_matches_single_device)."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    cfg_kw = dict(lr=1e-3, seed=5, optimizer="sgd", net="hourglass_2",
                  kernel_size=0.4, img_size=32,
                  supervise_all_stacks=True)
    tr1 = make_trainer(tmp_path / "a", mesh_devices=1, **cfg_kw)
    tr8 = make_trainer(tmp_path / "b", mesh_devices=8, **cfg_kw)
    batch, _ = tr1._pad(next(tr1.train_data.batches(8)))
    d1, d8 = tr1._put(batch), tr8._put(batch)
    c8 = tr8._train_step.lower(tr8.state, d8).compile()
    # gradient AND batch-stat reduction ride XLA-inserted collectives
    assert "all-reduce" in c8.as_text()
    tr1.state, m1 = tr1._train_step(tr1.state, d1)
    tr8.state, m8 = c8(tr8.state, d8)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-3, atol=1e-7)
    # atol 1e-4: fp32 all-reduce reduction-order noise through ~50
    # train-mode BN layers (each renormalizes, compounding roundoff) —
    # measured 3.6e-5 max.  A MISSING cross-replica BN reduction would
    # sit orders above this: each device would normalize with batch-1
    # shard statistics instead of the global batch-8 ones.
    for part in ("params", "batch_stats"):
        l1 = jax.tree_util.tree_leaves(getattr(tr1.state, part))
        l8 = jax.tree_util.tree_leaves(getattr(tr8.state, part))
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)
    tr1.close()
    tr8.close()
