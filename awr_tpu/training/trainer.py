"""Train/eval driver: thin host loop around jitted sharded steps.

Reference parity: the Trainer semantics of train.py (epoch loop, per-batch
encode/forward/decode/loss/step, per-epoch train-MPE + test + checkpoint,
log file, lr scheduling) and test.py (eval loop, PCK plot, prediction txt
dump).  Differences, all documented:

- One forward per train step; all hourglass stacks supervised by default
  (see awr_tpu/training/steps.py docstring).
- ``best_records`` is actually updated on improvement (the reference
  initializes it at train.py:75-77 but never writes it, so resume always
  restarts at epoch 1 unless the checkpoint carried records).
- Data parallel over a 1-D device mesh: the jitted step consumes a
  globally-batched array sharded on the batch axis; XLA inserts the ICI
  all-reduces for gradients and (global-view) BatchNorm statistics, so
  per-step math for a given global batch matches the single-device
  reference.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from awr_tpu.config import Config
from awr_tpu.data.pipeline import PrefetchLoader, prefetch_to_device
from awr_tpu.evaluation import Evaluator
from awr_tpu.models import build_model
from awr_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from awr_tpu.training.checkpoints import CheckpointManager
from awr_tpu.training.optim import (
    PlateauScheduler,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
    step_lr,
)
from awr_tpu.training.steps import (
    TrainState,
    make_eval_step,
    make_infer_step,
    make_raw_eval_step,
    make_raw_train_step,
    make_train_step,
)
from awr_tpu.training.watchdog import Watchdog
from awr_tpu.vis import plot_pose

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class Trainer:
    def __init__(self, config: Config, train_data=None, test_data=None,
                 workdir: Optional[str] = None, mesh=None):
        self.cfg = config
        self.train_data = train_data
        self.test_data = test_data

        self.work_dir = workdir or os.path.join(
            config.output_dir, config.dataset,
            "checkpoint_" + config.exp_id)
        self.result_dir = os.path.join(self.work_dir, "results")
        os.makedirs(self.result_dir, exist_ok=True)
        self.log_file = os.path.join(
            self.work_dir, f"{config.net}_{config.log_id}.log")
        self._log_fh = open(self.log_file, "a")
        self.print_msg("------------------- start -------------------",
                       stdout=False)
        for k, v in sorted(vars(config).items()):
            self.print_msg(f"{k}:{v}", stdout=False)

        if config.matmul_precision:
            jax.config.update("jax_default_matmul_precision",
                              config.matmul_precision)

        self.model = build_model(config.net, config.jt_num,
                                 config.downsample,
                                 dtype=DTYPES[config.compute_dtype],
                                 remat=config.remat)

        # init params on a dummy frame
        rng = jax.random.PRNGKey(config.seed)
        dummy = jnp.zeros((1, config.img_size, config.img_size, 1),
                          jnp.float32)
        variables = self.model.init(rng, dummy, train=True)

        self.optimizer = make_optimizer(config.optimizer,
                                        config.weight_decay)(
            learning_rate=config.lr)
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

        self.mesh = mesh or make_mesh(config.mesh_devices)
        self.n_dev = self.mesh.devices.size
        # Batches must split into grad_accum microbatches that each
        # shard over the mesh, so the final partial batch pads to a
        # multiple of accum*n_dev (padding rows are masked via 'w').
        self._pad_multiple = self.n_dev * max(
            1, int(getattr(config, "grad_accum", 1)))
        # Replicate state across the mesh; batches are sharded per step.
        self.state = jax.device_put(self.state, replicated(self.mesh))

        # >1 devices: the Pallas encode/decode must be shard_map'ed over
        # the batch axis (pallas_call has no GSPMD partitioning rule)
        pmesh = self.mesh if self.n_dev > 1 else None
        self._train_step = jax.jit(
            make_train_step(self.model, self.optimizer, config,
                            mesh=pmesh),
            donate_argnums=(0,))
        self._eval_step = jax.jit(make_eval_step(self.model, config,
                                                 mesh=pmesh))
        self._infer_step = jax.jit(make_infer_step(self.model, config,
                                                   mesh=pmesh))
        # fused raw-mode steps (device preprocessing inside the program)
        ds = train_data if train_data is not None else test_data
        if ds is not None and getattr(ds, "mode", "host") == "raw":
            self._raw_train_step = jax.jit(
                make_raw_train_step(self.model, self.optimizer, config,
                                    ds.paras, ds.flip, mesh=pmesh),
                donate_argnums=(0,))
            self._raw_eval_step = jax.jit(
                make_raw_eval_step(self.model, config, ds.paras, ds.flip,
                                   mesh=pmesh))

        # 'epoch' is the resume cursor (last completed epoch, reference
        # train.py:105); 'best_epoch' is the epoch that achieved the best
        # MPE/AUC and survives non-improving later epochs.
        self.best_records = {"epoch": 0, "best_epoch": 0, "MPE": 1e10,
                             "AUC": 0.0}
        self._watchdog = None  # armed by train() when step_timeout_s set
        self.plateau = (PlateauScheduler(config.lr)
                        if config.scheduler == "auto" else None)
        self.ckpt = CheckpointManager(os.path.join(self.work_dir, "ckpt"),
                                      max_to_keep=config.ckpt_max_to_keep)
        if config.load_model:
            self.restore(config.load_model)
        elif self.ckpt.latest_epoch() is not None:
            self.restore()

    # ------------------------------------------------------------ utils
    def print_msg(self, msg: str, stdout: bool = True):
        if stdout:
            print(msg)
        print(msg, file=self._log_fh)
        self._log_fh.flush()

    def _pad(self, batch):
        """Pad batch to a multiple of mesh_size*grad_accum; returns
        (batch, n).

        Adds a (B,) validity weight vector 'w' so padded duplicate rows
        are masked out of losses and gradients (the reference trains on
        the exact partial final batch)."""
        n = len(batch["img"])
        rem = (-n) % self._pad_multiple
        if rem:
            batch = {k: np.concatenate([v, np.repeat(v[-1:], rem, 0)])
                     for k, v in batch.items()}
        w = np.zeros(n + rem, np.float32)
        w[:n] = 1.0
        batch = dict(batch, w=w)
        return batch, n

    def _put(self, batch):
        keep = ("img", "jt_uvd", "jt_xyz", "w")
        dev = {k: jnp.asarray(batch[k]) for k in keep if k in batch}
        return shard_batch(dev, self.mesh)

    def _raw_inputs(self, raw, dataset):
        """Raw-mode batch -> (sharded device inputs, sharded f64-exact
        crop params, valid count) for the fused raw steps."""
        from awr_tpu.data.transforms import crop_params_np
        from awr_tpu.geometry import xyz2uvd_np

        batch, n = self._pad(raw)
        centers_uvd = xyz2uvd_np(batch["center_xyz"], dataset.paras,
                                 dataset.flip).astype(np.float64)
        p = crop_params_np(centers_uvd, batch["cube"],
                           np.asarray(dataset.paras), self.cfg.img_size)
        dev = shard_batch(dict(
            img=jnp.asarray(batch["img"], jnp.float32),
            jt_xyz=jnp.asarray(batch["jt_xyz"], jnp.float32),
            centers_uvd=jnp.asarray(centers_uvd, jnp.float32),
            cubes=jnp.asarray(batch["cube"], jnp.float32),
            w=jnp.asarray(batch["w"], jnp.float32),
        ), self.mesh)
        p_dev = shard_batch({k: jnp.asarray(v) for k, v in p.items()},
                            self.mesh)
        return dev, p_dev, n

    def _stage_fn(self, dataset):
        """Staging callback for prefetch_to_device: the fused raw-mode
        inputs, or pad + H2D upload + shard in host mode.  Shared by the
        train and eval loops so the staging semantics cannot diverge."""
        if getattr(dataset, "mode", "host") == "raw":
            def stage(raw):
                return self._raw_inputs(raw, dataset)
        else:
            def stage(raw):
                batch, n = self._pad(raw)
                return self._put(batch), batch, n
        return stage

    # ------------------------------------------------------------ train
    def _beat(self):
        """Progress heartbeat for the stall watchdog (no-op when off)."""
        if self._watchdog is not None:
            self._watchdog.beat()

    def train(self):
        """Epoch loop with optional stall detection.

        With ``Config.step_timeout_s`` set, a wedged device dispatch
        (observed failure mode: the tunnel connection blocks the main
        thread mid-call forever) terminates the process with
        ``watchdog.EXIT_STALLED`` so ``training/supervise.py`` can
        restart it; this Trainer auto-resumes from the newest committed
        checkpoint on construction.
        """
        if self.cfg.step_timeout_s:
            self._watchdog = Watchdog(
                self.cfg.step_timeout_s,
                on_stall=lambda m: self.print_msg(m, stdout=False),
                name=self.cfg.net).start()
        try:
            self._train_impl()
        finally:
            if self._watchdog is not None:
                self._watchdog.stop()
                self._watchdog = None

    def _train_impl(self):
        cfg = self.cfg
        assert self.train_data is not None, "no training dataset"
        eval_tool = Evaluator(cfg.img_size, self.train_data.paras,
                              self.train_data.flip, cfg.jt_num)
        # resume-aware epoch range (reference train.py:105)
        for epoch in range(self.best_records["epoch"] + 1,
                           cfg.max_epoch + 1):
            if cfg.scheduler == "step":
                lr = step_lr(cfg.lr, epoch, cfg.step)
            elif self.plateau is not None:
                lr = self.plateau.lr
            else:
                lr = cfg.lr
            self.state = self.state._replace(
                opt_state=set_learning_rate(self.state.opt_state, lr))

            losses, l_off, l_crd = [], 0.0, 0.0
            epoch_losses = []
            t0 = time.time()
            raw_mode = getattr(self.train_data, "mode", "host") == "raw"
            # threaded prefetch (reference: DataLoader num_workers,
            # train.py:99).  Host-mode training draws augmentations from
            # the dataset's single RandomState inside __getitem__, so it
            # MUST load sequentially to keep the stream deterministic
            # and reference-ordered; raw mode augments on device with
            # per-step jax keys and can use all workers.
            workers = cfg.num_workers if raw_mode else 1
            loader = PrefetchLoader(
                self.train_data, cfg.batch_size, shuffle=True,
                num_workers=workers,
                rng=np.random.RandomState(cfg.seed + epoch))
            # stage (pad + H2D upload + shard) device_prefetch batches
            # ahead on a background thread so the upload of batch i
            # overlaps the host decode of batch i+1
            staged_iter = prefetch_to_device(
                iter(loader), self._stage_fn(self.train_data),
                cfg.device_prefetch)
            pending = []  # defer device->host syncs to print/epoch time
            for ii, staged in enumerate(staged_iter):
                if raw_mode:
                    # fused step: device crop/augment + train in one jit
                    dev_raw, p, n = staged
                    key = jax.random.fold_in(
                        jax.random.PRNGKey(cfg.seed),
                        epoch * 1_000_003 + ii)
                    self.state, metrics = self._raw_train_step(
                        self.state, dev_raw, p, key)
                    fb = dict(jt_xyz=metrics["jt_xyz"],
                              center_xyz=metrics["center_xyz"],
                              M=metrics["M"], cube=metrics["cube"])
                else:
                    dev_batch, batch, n = staged
                    self.state, metrics = self._train_step(self.state,
                                                           dev_batch)
                    fb = {k: batch[k] for k in ("jt_xyz", "center_xyz",
                                                "M", "cube")}
                # keep everything on device; the step stream never stalls
                losses.append(metrics["loss"])
                epoch_losses.append(metrics["loss"])
                l_off, l_crd = metrics["loss_offset"], metrics["loss_coord"]
                pending.append((metrics["jt_uvd_pred"], n, fb))
                self._beat()
                if (ii + 1) % cfg.print_freq == 0:
                    self.print_msg(
                        "[epoch: {:02d}][train loss: {:.5f}]"
                        "[offset_loss: {:.5f}][coord_loss: {:.5f}]".format(
                            epoch,
                            float(np.mean([float(x) for x in losses])),
                            float(l_off), float(l_crd)))
                    losses = []
            for jt_pred, n, fb in pending:
                self._beat()  # the drain host-syncs; wedges surface here
                eval_tool.feed_batch(
                    np.asarray(jt_pred)[:n],
                    np.asarray(fb["jt_xyz"])[:n],
                    np.asarray(fb["center_xyz"])[:n],
                    np.asarray(fb["M"])[:n],
                    np.asarray(fb["cube"])[:n])
            train_mpe, _, _, _, _ = eval_tool.get_measures()
            eval_tool = Evaluator(cfg.img_size, self.train_data.paras,
                                  self.train_data.flip, cfg.jt_num)
            self.print_msg(
                "[epoch {:02d}], [train loss {:.5f}], [train mpe {:.5f}],"
                " [lr {:.1e}], [{:.1f}s]".format(
                    epoch,
                    (float(np.mean([float(x) for x in epoch_losses]))
                     if epoch_losses else 0.0),
                    train_mpe, lr, time.time() - t0))

            if self.plateau is not None:
                self.plateau.step(train_mpe)

            mpe, auc = self.test(epoch)
            if mpe < self.best_records["MPE"]:
                self.best_records.update(best_epoch=epoch, MPE=mpe,
                                         AUC=auc)
            self.best_records["epoch"] = epoch  # resume cursor
            self.save(epoch)
            self._beat()

    # ------------------------------------------------------------- eval
    def test(self, epoch: int = 0):
        cfg = self.cfg
        assert self.test_data is not None, "no test dataset"
        eval_tool = Evaluator(cfg.img_size, self.test_data.paras,
                              self.test_data.flip, cfg.jt_num)
        loss_sum, nb = 0.0, 0
        raw_mode = getattr(self.test_data, "mode", "host") == "raw"
        loader = PrefetchLoader(self.test_data, cfg.batch_size,
                                num_workers=cfg.num_workers)
        staged_iter = prefetch_to_device(
            iter(loader), self._stage_fn(self.test_data),
            cfg.device_prefetch)
        # dispatch every eval step without a host sync; materialize the
        # losses/joints afterwards (a float(loss) per batch would
        # serialize the whole eval on the dispatch round-trip)
        pending = []
        for ii, staged in enumerate(staged_iter):
            if raw_mode:
                # fused: device crop/normalize + forward + decode in one jit
                dev_raw, p, n = staged
                metrics = self._raw_eval_step(
                    self.state.params, self.state.batch_stats, dev_raw, p)
                fb = {k: metrics[k] for k in
                      ("img", "jt_uvd", "jt_xyz", "center_xyz", "M",
                       "cube")}
            else:
                dev_batch, batch, n = staged
                metrics = self._eval_step(self.state.params,
                                          self.state.batch_stats,
                                          dev_batch)
                fb = batch
            vis = bool(cfg.vis_freq) and (ii + 1) % cfg.vis_freq == 0
            keep = ("jt_xyz", "center_xyz", "M", "cube") + (
                ("img", "jt_uvd") if vis else ())
            pending.append((metrics["loss"], metrics["jt_uvd_pred"], n,
                            {k: fb[k] for k in keep}, ii, vis))
            self._beat()
        for loss, jt_dev, n, fb, ii, vis in pending:
            self._beat()
            loss_sum += float(loss)
            nb += 1
            jt_pred = np.asarray(jt_dev)[:n]
            eval_tool.feed_batch(jt_pred, np.asarray(fb["jt_xyz"])[:n],
                                 np.asarray(fb["center_xyz"])[:n],
                                 np.asarray(fb["M"])[:n],
                                 np.asarray(fb["cube"])[:n])
            if vis:
                img_path = os.path.join(
                    self.result_dir,
                    f"test_epoch_{epoch}_iter_{ii + 1}.png")
                plot_pose(
                    np.asarray(fb["img"])[0],
                    img_path,
                    (jt_pred[0] + 1) * cfg.img_size / 2.0,
                    (np.asarray(fb["jt_uvd"])[0] + 1)
                    * cfg.img_size / 2.0,
                    dataset=cfg.dataset)

        mpe, mid, auc, pck, thresh = eval_tool.get_measures()
        eval_tool.plot_pck(
            os.path.join(self.work_dir, f"test_pck_epoch_{epoch}.png"),
            pck, thresh)
        if epoch in (0, -1):
            # reference writes the dump with the MPE in the filename
            # (train.py:217-221, test.py:105-108)
            eval_tool.save_predictions(
                os.path.join(self.work_dir, "test_%.3f.txt" % mpe))
        self.print_msg(
            "[epoch {:2d}], [test loss {:.5f}], [test mpe {:.3f}],"
            " [test auc {:.3f}]".format(
                epoch, loss_sum / max(nb, 1), mpe, auc))
        return mpe, auc

    # ------------------------------------------------------ checkpoints
    def save(self, epoch: int):
        plateau = ([self.plateau.lr, self.plateau.best,
                    float(self.plateau.num_bad)]
                   if self.plateau is not None else [0.0, 0.0, 0.0])
        self.ckpt.save(epoch, dict(
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state,
            step=self.state.step,
            best_records=self.best_records,
            lr=get_learning_rate(self.state.opt_state),
            plateau=plateau,
        ))

    def restore(self, path: Optional[str] = None,
                epoch: Optional[int] = None):
        if path and path.endswith(".pth"):
            # reference checkpoint (config.py load_model points at e.g.
            # './results/hourglass_1.pth'): import the torch state dict
            # in place of params/batch_stats; optimizer state stays
            # fresh, mirroring the reference's load_state_dict-only
            # restore (train.py loads weights, never optimizer state)
            from awr_tpu.models.torch_import import (
                import_reference_weights,
            )

            variables = import_reference_weights(
                self.cfg.net, path, self.cfg.downsample)
            self.state = self.state._replace(
                params=jax.device_put(variables["params"],
                                      replicated(self.mesh)),
                batch_stats=jax.device_put(variables["batch_stats"],
                                           replicated(self.mesh)))
            self.print_msg(f"imported reference weights from {path}")
            return
        mgr = CheckpointManager(path) if path else self.ckpt
        template = dict(
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state,
            step=self.state.step,
            best_records=self.best_records,
            lr=0.0,
            plateau=[0.0, 0.0, 0.0],
        )
        try:
            restored = mgr.restore(epoch, template=template)
        except Exception as primary:
            # legacy checkpoint without 'best_epoch' in best_records;
            # if the legacy retry fails too, surface the ORIGINAL error
            # (a corrupt checkpoint / shape mismatch should not be
            # masked by a confusing legacy-template failure)
            legacy = dict(template, best_records={
                k: v for k, v in self.best_records.items()
                if k != "best_epoch"})
            try:
                restored = mgr.restore(epoch, template=legacy)
            except Exception:
                raise primary
        self.state = TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"]),
        )
        self.state = jax.device_put(self.state, replicated(self.mesh))
        self.best_records = jax.tree_util.tree_map(
            lambda x: x.item() if hasattr(x, "item") else x,
            restored["best_records"])
        self.best_records.setdefault("best_epoch",
                                     self.best_records["epoch"])
        if self.plateau is not None and "plateau" in restored:
            lr, best, bad = [float(x) for x in restored["plateau"]]
            if lr > 0:
                self.plateau.lr = lr
                self.plateau.best = best
                self.plateau.num_bad = int(bad)
        self.print_msg(
            f"restored checkpoint (epoch {self.best_records['epoch']})")

    def close(self):
        self.ckpt.close()
        self._log_fh.close()
