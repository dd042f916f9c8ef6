"""Gradient accumulation (Config.grad_accum) and rematerialization
(Config.remat) semantics.

- remat must be a pure memory/recompute trade: identical param trees,
  identical outputs, identical gradients (models/{resnet,hourglass}.py).
- grad_accum must equal torch-style accumulation: per-microbatch grads
  at FIXED params averaged into ONE optimizer update, BatchNorm stats
  chained sequentially (training/steps.py make_train_step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awr_tpu.config import Config
from awr_tpu.data.synthetic import SyntheticHandDataset
from awr_tpu.models import build_model
from awr_tpu.training.steps import TrainState
from awr_tpu.training.trainer import Trainer

# mesh_devices=1: the manual oracle feeds batch-2 microbatches, which
# the virtual 8-device test mesh could not shard
SMALL = dict(img_size=64, batch_size=8, vis_freq=0, use_pallas=False,
             print_freq=1000, kernel_size=1.0, mesh_devices=1)


def small_config(**kw):
    base = dict(SMALL, net="resnet_18")
    base.update(kw)
    return Config(**base)


def make_trainer(tmp_path, name, n=8, **kw):
    cfg = small_config(**kw)
    train = SyntheticHandDataset(n, cfg.jt_num, cfg.img_size,
                                 phase="train", seed=0)
    test = SyntheticHandDataset(n, cfg.jt_num, cfg.img_size,
                                phase="test", seed=1)
    return Trainer(cfg, train_data=train, test_data=test,
                   workdir=str(tmp_path / name))


def _tree_allclose(a, b, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=0)


@pytest.mark.parametrize("net", ["resnet_18", "hourglass_1"])
def test_remat_is_a_pure_memory_tradeoff(net):
    """remat=True changes neither params, outputs, nor gradients."""
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
    models = [build_model(net, 14, 2, remat=r) for r in (False, True)]
    variables = [m.init(jax.random.PRNGKey(0), img, train=True)
                 for m in models]
    # identical param trees (same module paths -> ckpt compatible)
    assert (jax.tree_util.tree_structure(variables[0])
            == jax.tree_util.tree_structure(variables[1]))
    _tree_allclose(variables[0], variables[1], atol=0)

    outs = [m.apply(v, img, train=False)
            for m, v in zip(models, variables)]
    np.testing.assert_array_equal(np.asarray(outs[0]),
                                  np.asarray(outs[1]))

    def loss(params, model, batch_stats):
        out, _ = model.apply({"params": params,
                              "batch_stats": batch_stats},
                             img, train=True, mutable=["batch_stats"])
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grads = [jax.grad(loss)(v["params"], m, v["batch_stats"])
             for m, v in zip(models, variables)]
    _tree_allclose(grads[0], grads[1], atol=1e-6)


def test_grad_accum_matches_manual_microbatch_averaging(tmp_path):
    """One grad_accum=4 step == averaging the four params that result
    from stepping each microbatch separately from the SAME start.

    With a fresh (zero-momentum) SGD state the first update is linear
    in the gradient, so mean_i(params - lr*g_i) == params - lr*mean(g_i)
    — the accumulated update — with no access to internals needed.
    BatchNorm stats must chain sequentially through the microbatches.
    """
    accum = make_trainer(tmp_path, "accum", optimizer="sgd", lr=1e-2,
                         grad_accum=4)
    single = make_trainer(tmp_path, "single", optimizer="sgd", lr=1e-2)
    _tree_allclose(accum.state.params, single.state.params, atol=0)

    batch, _ = accum._pad(next(accum.train_data.batches(8)))
    dev = accum._put(batch)
    state0 = accum.state

    # the jitted steps donate their input state buffers, so every manual
    # call gets fresh copies of the reset params / chained BN stats
    def copy(tree):
        return jax.tree_util.tree_map(jnp.array, tree)

    params0, opt0 = state0.params, state0.opt_state
    bs = state0.batch_stats
    stepped, jts, losses = [], [], []
    for i in range(4):
        micro = {k: v[2 * i : 2 * i + 2] for k, v in batch.items()}
        st = TrainState(copy(params0), copy(bs), copy(opt0),
                        copy(state0.step))
        st2, mi = single._train_step(st, single._put(micro))
        stepped.append(st2.params)
        bs = st2.batch_stats  # chain BN stats, params stay reset
        jts.append(np.asarray(mi["jt_uvd_pred"]))
        losses.append(float(mi["loss"]))

    new_state, m = accum._train_step(state0, dev)

    expect_params = jax.tree_util.tree_map(
        lambda *xs: sum(xs) / len(xs), *stepped)
    _tree_allclose(new_state.params, expect_params, atol=1e-6)
    _tree_allclose(new_state.batch_stats, bs, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m["jt_uvd_pred"]),
                               np.concatenate(jts), atol=1e-5)
    assert float(m["loss"]) == pytest.approx(np.mean(losses), abs=1e-6)
    accum.close()
    single.close()


def test_grad_accum_partial_final_batch(tmp_path):
    """The epoch-final PARTIAL batch under grad_accum: must pad to a
    multiple of accum (not crash on an indivisible shape), weight every
    valid sample equally across microbatches, and give the all-padding
    last microbatch zero gradient weight (not NaN-poison the step)."""
    accum = make_trainer(tmp_path, "accum_p", optimizer="sgd", lr=1e-2,
                         grad_accum=4)
    single = make_trainer(tmp_path, "single_p", optimizer="sgd", lr=1e-2)
    _tree_allclose(accum.state.params, single.state.params, atol=0)

    raw = next(accum.train_data.batches(8))
    partial = {k: v[:5] for k, v in raw.items()}  # 5 valid rows
    batch, n = accum._pad(partial)
    assert n == 5 and len(batch["img"]) == 8  # padded to accum multiple
    # microbatch valid counts: (2, 2, 1, 0) — last is ALL padding
    state0 = accum.state

    def copy(tree):
        return jax.tree_util.tree_map(jnp.array, tree)

    params0, opt0 = state0.params, state0.opt_state
    bs = state0.batch_stats
    stepped, weights = [], []
    for i in range(4):
        micro = {k: v[2 * i : 2 * i + 2] for k, v in batch.items()}
        st = TrainState(copy(params0), copy(bs), copy(opt0),
                        copy(state0.step))
        st2, mi = single._train_step(st, single._put(micro))
        assert np.isfinite(float(mi["loss"]))
        stepped.append(st2.params)
        weights.append(float(micro["w"].sum()))
        bs = st2.batch_stats  # chain BN stats (incl. all-pad microbatch)

    new_state, m = accum._train_step(state0, accum._put(batch))
    assert np.isfinite(float(m["loss"]))

    # fresh SGD updates are linear in the gradient, so the weighted mean
    # of per-microbatch params equals the weighted-gradient update
    assert weights == [2.0, 2.0, 1.0, 0.0]
    wtot = sum(weights)
    expect_params = jax.tree_util.tree_map(
        lambda *xs: sum(wi * x for wi, x in zip(weights, xs)) / wtot,
        *stepped)
    _tree_allclose(new_state.params, expect_params, atol=1e-6)
    _tree_allclose(new_state.batch_stats, bs, atol=1e-6)
    accum.close()
    single.close()


def test_grad_accum_mesh_equivalence(tmp_path):
    """grad_accum under the 8-device data-parallel mesh computes the
    same update as on one device (microbatch 16/2=8 shards evenly)."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    kw = dict(optimizer="sgd", lr=1e-2, grad_accum=2, batch_size=16)
    meshy = make_trainer(tmp_path, "mesh8", n=16, mesh_devices=8, **kw)
    solo = make_trainer(tmp_path, "mesh1", n=16, mesh_devices=1, **kw)
    _tree_allclose(meshy.state.params, solo.state.params, atol=0)

    batch, _ = meshy._pad(next(meshy.train_data.batches(16)))
    st_m, m_m = meshy._train_step(meshy.state, meshy._put(batch))
    st_s, m_s = solo._train_step(solo.state, solo._put(batch))
    _tree_allclose(st_m.params, st_s.params, atol=1e-6)
    np.testing.assert_allclose(float(m_m["loss"]), float(m_s["loss"]),
                               atol=1e-6)
    meshy.close()
    solo.close()


def test_remat_accum_trainer_ckpt_compatible(tmp_path):
    """A remat+accum trainer trains, checkpoints, and its checkpoint
    restores into a plain trainer (identical param paths)."""
    tr = make_trainer(tmp_path, "ra", remat=True, grad_accum=2,
                      max_epoch=1)
    tr.train()
    tr.ckpt.wait()  # saves are async; flush before another manager reads
    plain = make_trainer(tmp_path, "plain")
    plain.restore(path=str(tmp_path / "ra" / "ckpt"), epoch=1)
    _tree_allclose(plain.state.params, tr.state.params, atol=0)
    tr.close()
    plain.close()


def test_grad_accum_remat_mesh_equivalence(tmp_path):
    """grad_accum AND remat together under the 8-device mesh == one
    device (VERDICT r3 next-7: the modes were mesh-tested separately;
    users enable them together for big-batch training).  The remat
    half must stay a pure memory trade inside the scanned microbatch
    loop under GSPMD partitioning."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    kw = dict(optimizer="sgd", lr=1e-2, grad_accum=2, remat=True,
              batch_size=16)
    meshy = make_trainer(tmp_path, "m8r", n=16, mesh_devices=8, **kw)
    solo = make_trainer(tmp_path, "m1r", n=16, mesh_devices=1, **kw)
    _tree_allclose(meshy.state.params, solo.state.params, atol=0)

    batch, _ = meshy._pad(next(meshy.train_data.batches(16)))
    st_m, m_m = meshy._train_step(meshy.state, meshy._put(batch))
    st_s, m_s = solo._train_step(solo.state, solo._put(batch))
    _tree_allclose(st_m.params, st_s.params, atol=1e-6)
    # stats tolerate fp32 cross-device reduction-order noise (measured
    # 3.7e-5 max); per-shard (unreduced) stats would differ at ~1e-1
    _tree_allclose(st_m.batch_stats, st_s.batch_stats, atol=1e-4)
    np.testing.assert_allclose(float(m_m["loss"]), float(m_s["loss"]),
                               atol=1e-6)
    meshy.close()
    solo.close()
