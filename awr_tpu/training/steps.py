"""Jitted train/eval step factories.

Reference parity: the per-batch math of train.py:107-131 / test.py:67-97 —
GT offset-field encode, backbone forward, adaptive decode, weighted
dense+coord smooth-L1 — as pure functions of (params, batch_stats,
opt_state, batch).

Improvements over the reference (behavior-preserving unless noted):
- One forward per step.  The reference hourglass loop calls
  ``self.net(input)`` afresh for every stack index (train.py:116-121),
  recomputing the whole network nstack times AND only backpropagating the
  last stack's loss (the loop overwrites ``loss``).  Here the stacked
  (S, B, F, F, 4J) output comes from one forward; with
  ``supervise_all_stacks=True`` (default) every stack contributes to the
  loss (standard hourglass deep supervision), with ``False`` only the
  last stack does — matching the reference's effective gradients.
- Everything (encode, forward, decode, loss, optimizer update) fuses into
  one XLA program per step; no host round-trips.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from awr_tpu.ops import smooth_l1_loss
from awr_tpu.ops.decode import decode_offsets
from awr_tpu.ops.encode import encode_offsets


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _stacked(out: jax.Array) -> jax.Array:
    """Normalize model output to (S, B, F, F, 4J)."""
    return out if out.ndim == 5 else out[None]


def make_train_step(model, optimizer, cfg, mesh=None, quant=None):
    """Returns ``train_step(state, batch) -> (state, metrics)``.

    ``mesh`` (optional, >1 devices): shard_maps the Pallas encode/decode
    over the batch axis so the kernels run on local shards instead of
    forcing an all-gather of the dense maps (ops/decode.py docstring).

    ``quant``: frozen calibrated activation scales for a
    ``quant_mode='qat'`` model (models/quant.py) — the QAT fine-tune
    path (training/qat.py) closes the scales over the step like
    make_eval_step does.
    """
    kernel = cfg.kernel_size
    feat = cfg.feature_size
    dense_w = cfg.dense_weight
    coord_w = cfg.coord_weight
    supervise_all = cfg.supervise_all_stacks
    accum = max(1, int(getattr(cfg, "grad_accum", 1)))

    def micro_grads(params, batch_stats, batch):
        """Gradients + aux for ONE (micro)batch at fixed params."""
        img = batch["img"]  # (B, S, S)
        # (B,) validity weights mask mesh-size padding rows (if present)
        w = batch.get("w")
        offset_gt = encode_offsets(batch["jt_uvd"], img, kernel, feat,
                                   use_pallas=cfg.use_pallas, mesh=mesh)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": batch_stats}
            if quant is not None:
                variables["quant"] = quant
            out, mut = model.apply(
                variables, img[..., None], train=True,
                mutable=["batch_stats"],
            )
            preds = _stacked(out)
            nstack = preds.shape[0]
            idxs = range(nstack) if supervise_all else [nstack - 1]
            loss_offset = 0.0
            loss_coord = 0.0
            jt_pred = None
            for s in idxs:
                jt_pred = decode_offsets(preds[s], img, kernel,
                                         use_pallas=cfg.use_pallas,
                                         mesh=mesh)
                loss_coord += coord_w * smooth_l1_loss(
                    jt_pred, batch["jt_uvd"], sample_weight=w)
                loss_offset += dense_w * smooth_l1_loss(
                    preds[s], offset_gt, sample_weight=w)
            loss = loss_coord + loss_offset
            return loss, (mut["batch_stats"], jt_pred, loss_offset,
                          loss_coord)

        (loss, (bs, jt_pred, l_off, l_crd)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        )
        # valid-sample count of this (micro)batch: the losses above are
        # normalized by it, so microbatch aggregation must weight by it
        # to reproduce the accum=1 result when padding rows exist
        wsum = (jnp.sum(w) if w is not None
                else jnp.asarray(img.shape[0], jnp.float32))
        return grads, bs, jt_pred, (loss, l_off, l_crd), wsum

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        if accum == 1:
            grads, batch_stats, jt_pred, (loss, l_off, l_crd), _ = (
                micro_grads(state.params, state.batch_stats, batch)
            )
        else:
            # Microbatch scan (cfg.grad_accum): aggregate per-microbatch
            # gradients weighted by each microbatch's valid-sample count
            # (== plain averaging when no padding rows exist, and every
            # VALID sample contributes equally when the padded final
            # partial batch spans microbatches — Trainer._pad pads to a
            # multiple of accum*mesh so the shapes always divide), chain
            # BatchNorm stats sequentially, apply ONE optimizer update.
            # Peak activation memory is that of a B/accum batch; the
            # update matches torch-style grad accum (BN per microbatch).
            B = batch["img"].shape[0]
            assert B % accum == 0, (
                f"batch size {B} not divisible by grad_accum {accum}")
            if mesh is not None and (B // accum) % mesh.size != 0:
                raise ValueError(
                    f"microbatch {B // accum} (batch {B} / grad_accum "
                    f"{accum}) not divisible by the {mesh.size}-device "
                    f"data-parallel mesh")

            def to_micro(x):
                return x.reshape((accum, B // accum) + x.shape[1:])

            micro = jax.tree_util.tree_map(to_micro, batch)
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like,
                                                state.params)

            def body(carry, mb):
                bs, acc, wtot = carry
                g, bs, jt_pred, losses, wi = micro_grads(state.params,
                                                         bs, mb)
                acc = jax.tree_util.tree_map(
                    lambda a, gi: a + gi * wi, acc, g)
                return (bs, acc, wtot + wi), (jt_pred, losses, wi)

            (batch_stats, acc, wtot), (jt_micro, losses, wis) = (
                jax.lax.scan(body,
                             (state.batch_stats, zero_grads,
                              jnp.zeros((), jnp.float32)), micro))
            grads = jax.tree_util.tree_map(lambda g: g / wtot, acc)
            jt_pred = jt_micro.reshape((B,) + jt_micro.shape[2:])
            loss, l_off, l_crd = (jnp.sum(x * wis) / wtot
                                  for x in losses)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, batch_stats, opt_state,
                               state.step + 1)
        metrics = dict(loss=loss, loss_offset=l_off, loss_coord=l_crd,
                       jt_uvd_pred=jt_pred)
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg, mesh=None, quant=None):
    """Returns ``eval_step(params, batch_stats, batch) -> metrics`` with
    decoded joints + the same losses the reference reports in eval.

    Reference parity: the eval loop SUMS the per-stack coord+offset
    losses over every hourglass stack (test.py:74-87, one forward per
    stack there — one shared forward here, same math) while the metrics
    use the LAST stack's decoded joints (the loop leaves
    ``jt_uvd_pred`` bound to the final stage).

    ``quant``: calibrated activation scales for a ``quant_mode='int8'``
    model (models/quant.py), closed over like in make_infer_step."""
    kernel = cfg.kernel_size
    feat = cfg.feature_size
    dense_w = cfg.dense_weight
    coord_w = cfg.coord_weight

    def eval_step(params, batch_stats, batch):
        img = batch["img"]
        w = batch.get("w")
        variables = {"params": params, "batch_stats": batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, img[..., None], train=False)
        preds = _stacked(out)
        offset_gt = encode_offsets(batch["jt_uvd"], img, kernel, feat,
                                   use_pallas=cfg.use_pallas, mesh=mesh)
        loss_offset = 0.0
        loss_coord = 0.0
        jt_pred = None
        for s in range(preds.shape[0]):
            jt_pred = decode_offsets(preds[s], img, kernel,
                                     use_pallas=cfg.use_pallas,
                                     mesh=mesh)
            loss_coord += coord_w * smooth_l1_loss(
                jt_pred, batch["jt_uvd"], sample_weight=w)
            loss_offset += dense_w * smooth_l1_loss(
                preds[s], offset_gt, sample_weight=w)
        return dict(jt_uvd_pred=jt_pred, loss=loss_coord + loss_offset,
                    loss_offset=loss_offset, loss_coord=loss_coord)

    return eval_step


def make_raw_train_step(model, optimizer, cfg, paras, flip: int,
                        mesh=None):
    """Fused raw-mode step: device crop/augment/normalize + encode +
    forward + loss + update in ONE jitted program.

    Takes raw (B, H0, W0) mm frames, absolute joints, host-computed
    f64-exact crop params, and a PRNG key for the per-sample
    choose-one-of-four augmentation (awr_tpu.data.device).
    """
    from awr_tpu.data.device import draw_augment_params, train_preprocess

    base = make_train_step(model, optimizer, cfg, mesh=mesh)
    paras_arr = jnp.asarray(paras, jnp.float32)
    s_t, s_s, s_r = cfg.augment_para

    def raw_train_step(state: TrainState, raw, crop_params, key):
        aug = draw_augment_params(key, raw["img"].shape[0], s_t, s_s, s_r)
        pre = train_preprocess(raw["img"], raw["jt_xyz"],
                               raw["centers_uvd"], raw["cubes"],
                               paras_arr, crop_params, aug,
                               cfg.img_size, flip)
        batch = dict(img=pre["img"], jt_uvd=pre["jt_uvd"],
                     jt_xyz=pre["jt_xyz"])
        if "w" in raw:
            batch["w"] = raw["w"]
        state, metrics = base(state, batch)
        metrics.update(M=pre["M"], cube=pre["cube"],
                       center_xyz=pre["center_xyz"],
                       jt_xyz=pre["jt_xyz"])
        return state, metrics

    return raw_train_step


def make_raw_eval_step(model, cfg, paras, flip: int, mesh=None):
    """Fused raw-mode eval: device crop/normalize + forward + decode +
    losses in one jitted program (augmentation forced to 'none')."""
    from awr_tpu.data.device import train_preprocess

    base = make_eval_step(model, cfg, mesh=mesh)
    paras_arr = jnp.asarray(paras, jnp.float32)

    def raw_eval_step(params, batch_stats, raw, crop_params):
        B = raw["img"].shape[0]
        aug = (jnp.full((B,), 3, jnp.int32),  # op 3 == none
               jnp.zeros((B, 3)), jnp.ones((B,)), jnp.zeros((B,)))
        pre = train_preprocess(raw["img"], raw["jt_xyz"],
                               raw["centers_uvd"], raw["cubes"],
                               paras_arr, crop_params, aug,
                               cfg.img_size, flip)
        batch = dict(img=pre["img"], jt_uvd=pre["jt_uvd"],
                     jt_xyz=pre["jt_xyz"])
        if "w" in raw:
            batch["w"] = raw["w"]
        metrics = base(params, batch_stats, batch)
        metrics.update(M=pre["M"], cube=pre["cube"],
                       center_xyz=pre["center_xyz"],
                       jt_xyz=pre["jt_xyz"], img=pre["img"],
                       jt_uvd=pre["jt_uvd"])
        return metrics

    return raw_eval_step


def make_infer_step(model, cfg, mesh=None, quant=None):
    """Forward + decode only (throughput path; bf16- and int8-able).

    ``quant``: calibrated activation-scale collection for a
    ``quant_mode='int8'`` model (models/quant.py).  Closed over rather
    than passed per call — the scales are tiny scalars and XLA
    constant-folds them into the quantize ops.
    """
    kernel = cfg.kernel_size

    def infer_step(params, batch_stats, img):
        variables = {"params": params, "batch_stats": batch_stats}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(variables, img[..., None], train=False)
        preds = _stacked(out)
        return decode_offsets(preds[-1], img, kernel,
                              use_pallas=cfg.use_pallas, mesh=mesh)

    return infer_step
