"""Quantization-aware fine-tuning (QAT) for int8 serving.

Post-training int8 (models/quant.py, serving.Predictor.quantize) trades
accuracy for the v5e MXU's 2x int8 throughput (+0.3 mm MPE on a trained
resnet_18; runs/convergence_r02b_int8.json).  QAT recovers that loss:
starting from trained fp weights, fine-tune for a few hundred steps
with the forward running fake-quantized — int8 rounding of weights and
activations baked into the graph, straight-through-estimator gradients
(models/quant.py ``mode='qat'``) — so the weights adapt to the int8
grid.  Activation scales are calibrated once up front and FROZEN during
the fine-tune (freeze-observer QAT, the standard recipe); serving then
runs ``quant_mode='int8'`` with the SAME scales, so the deployed int8
graph computes exactly what the fine-tune optimized.

The default budget is the GENTLE recipe, 100 steps @ 1e-5
(:func:`gap_scaled_recipe` — the name records its refuted round-3
gap-branching history; its docstring carries the n=3 on-chip evidence
that gap size does not predict the safe budget).  The production
defense is VALIDATED QAT: pass ``holdout_batches`` to
:meth:`awr_tpu.serving.Predictor.quantize_qat` and the fine-tune is
kept only if it beats plain PTQ held-out.

No reference counterpart (the reference is fp32 CUDA only;
train.py/test.py have no quantization path); the bar is our own test
suite (tests/test_quant.py) plus the measured accuracy recovery on a
trained model (benchmarks/convergence_run.py --qat-steps,
runs/convergence_qat_r02.json).
"""

from __future__ import annotations

import itertools
from typing import Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from awr_tpu.config import Config
from awr_tpu.models import build_model
from awr_tpu.models.quant import calibrate
from awr_tpu.training.optim import make_optimizer
from awr_tpu.training.steps import TrainState, make_train_step

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def gap_scaled_recipe(ptq_delta_mm: float) -> tuple:
    """The default QAT budget.  Returns ``(steps, lr)``.

    History: through round 3 this returned an AGGRESSIVE budget
    (500 steps @ 1e-4) for PTQ gaps >= 0.1 mm, a boundary interpolated
    from n=2.  The round-4 resnet_50 generality run REFUTED that rule,
    so the gentle budget is now the default for every gap.  Measured
    provenance, all on chip, all committed:

    | model       | PTQ gap  | 500 @ 1e-4 (aggressive) | 100 @ 1e-5 (gentle) |
    |-------------|----------|-------------------------|---------------------|
    | resnet_18   | +0.129   | closed gap, beat fp     | beat fp too: -0.057 |
    |             | / +0.018 |                         | (r04 retrain)       |
    | hourglass_1 | +0.072   | overfit: +0.060 WORSE   | +0.003              |
    | resnet_50   | +0.48-87 | DESTABILIZED: +1.565,   | +0.176 (80% of gap  |
    |             |          | tune loss itself ROSE   | recovered)          |

    (runs/convergence_qat_r02.json, convergence_qat_hourglass_r02{,b}
    .json, convergence_qat_resnet{50,18}_r04{_gentle,}*.json.)  The
    grid is complete at n=4 runs across all 3 measured families:
    gentle NEVER hurt and twice ended below the fp model; aggressive
    hurt 2 of 3.  Gap size does
    NOT predict the safe budget: resnet_50's gap was 4-7x resnet_18's
    and the aggressive recipe still made int8 WORSE than no QAT at all
    (lr 1e-4 destabilizes the outlier-heavy deeper net — its fine-tune
    loss rose 6.7e-5 -> 7.8e-5).  The gentle budget has never hurt on
    any measured model and recovers most of the gap, so it is the
    default; treat 500 @ 1e-4 as a manual escalation to try only when
    the gentle result leaves most of the gap AND the fine-tune loss
    curve is still decreasing.  Production callers should prefer
    :meth:`awr_tpu.serving.Predictor.quantize_qat` with
    ``holdout_batches``, which validates held-out and FALLS BACK to
    PTQ weights if the fine-tune regressed — the defense that does not
    depend on any budget rule being right.

    The resnet_50 runs also show the PTQ gap itself is calibration-
    sample-sensitive (+0.481 vs +0.870 from two different calibration
    draws of the same trained model), another reason not to branch a
    recipe on its exact value.
    """
    del ptq_delta_mm  # measured: gap size does not predict the budget
    return 100, 1e-5


def finetune(cfg: Config, params, batch_stats,
             batches: Sequence[Dict[str, np.ndarray]], *,
             steps: int = 300, lr: float = 1e-4,
             percentile: float = 99.99,
             quant=None, mesh=None):
    """QAT fine-tune trained weights to the int8 grid.

    Args:
      cfg: the model/loss config the weights were trained with.
      params, batch_stats: trained fp variables (Trainer.state or
        serving.Predictor fields).
      batches: training batches, each a dict with ``img`` (B, S, S)
        normalized depth and ``jt_uvd`` (B, J, 3) normalized targets
        (the Trainer's host-mode batch convention); cycled if ``steps``
        exceeds ``len(batches)``.  They double as the calibration set.
      steps: optimizer updates (QAT is a short fine-tune; hundreds of
        steps suffice — the weights only nudge onto the grid).
      lr: fine-tune learning rate.  Prefer
        :func:`gap_scaled_recipe`'s (100, 1e-5) default — 1e-4
        destabilized resnet_50 outright (see its docstring for the
        n=3 on-chip provenance); this function's own defaults are kept
        only for explicit callers.
      percentile: activation-scale calibration statistic (see
        serving.Predictor.quantize for why p99.99, not the max).
      quant: optional pre-calibrated activation scales; skips the
        calibration pass (e.g. reuse a PTQ Predictor's scales).
      mesh: optional multi-device mesh (batch-axis data parallel, same
        contract as make_train_step).

    Returns:
      ``(params, batch_stats, quant, losses)`` — fine-tuned variables,
      the frozen activation scales to serve with
      (``quant_mode='int8'``), and the per-step loss history.
    """
    if not batches:
        raise ValueError("QAT fine-tune needs at least one batch")
    dtype = DTYPES[cfg.compute_dtype]
    if quant is None:
        cal_model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                                dtype=dtype, quant_mode="calib")
        quant = calibrate(cal_model, params, batch_stats,
                          [np.asarray(b["img"], np.float32)
                           for b in batches],
                          percentile=percentile)

    qat_model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                            dtype=dtype, quant_mode="qat")
    optimizer = make_optimizer(cfg.optimizer, cfg.weight_decay)(
        learning_rate=lr)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    # NO buffer donation here, deliberately: the initial state wraps
    # the CALLER'S params/batch_stats arrays (e.g. a live Predictor's
    # or Trainer's), and donating them would delete buffers the caller
    # still owns — leaving it permanently broken if the fine-tune
    # fails midway.  A few hundred steps at fine-tune batch sizes do
    # not need the donation memory savings.
    step_fn = jax.jit(
        make_train_step(qat_model, optimizer, cfg, mesh=mesh,
                        quant=quant))

    dev_batches = [
        {k: jnp.asarray(np.asarray(b[k], np.float32))
         for k in ("img", "jt_uvd")}
        for b in batches
    ]
    losses = []
    for _, batch in zip(range(steps), itertools.cycle(dev_batches)):
        state, metrics = step_fn(state, batch)
        losses.append(metrics["loss"])
    losses = [float(x) for x in losses]
    return state.params, state.batch_stats, quant, losses


def batches_from_dataset(dataset, batch_size: int = 32,
                         n_batches: Optional[int] = None
                         ) -> Iterable[Dict[str, np.ndarray]]:
    """Materialize host-mode (img, jt_uvd) batches for :func:`finetune`
    from any awr_tpu dataset (data/base.py protocol)."""
    out = []
    for batch in dataset.batches(batch_size):
        out.append({"img": np.asarray(batch["img"], np.float32),
                    "jt_uvd": np.asarray(batch["jt_uvd"], np.float32)})
        if n_batches is not None and len(out) >= n_batches:
            break
    return out


def int8_holdout_metrics(cfg: Config, quant,
                         batches: Sequence[Dict[str, np.ndarray]],
                         *candidates) -> list:
    """Int8-graph eval-mode metrics over labeled HOLDOUT batches for
    each ``(params, batch_stats)`` candidate; returns one
    ``{"loss", "joint_err"}`` dict per candidate.

    The validation metrics for fallback-guarded QAT
    (:meth:`awr_tpu.serving.Predictor.quantize_qat` with
    ``holdout_batches``): scored with the SAME frozen scales before and
    after the fine-tune, on data the fine-tune never saw, they decide
    whether QAT actually helped — the round-4 resnet_50 run showed a
    budget rule alone cannot be trusted to know
    (runs/convergence_qat_resnet50_r04.json: 'gap-scaled' QAT scored
    +1.1 mm WORSE than plain PTQ held-out).

    ``joint_err`` is the gate metric (VERDICT r4 weak-7): mean
    per-joint L2 error of the DECODED joints in normalized uvd space —
    the linear proxy for the mm MPE every accuracy claim in the
    evidence grid is stated in (evaluation.py de-normalizes uvd by
    per-sample affine + cube scaling, both fixed across candidates).
    ``loss`` (the smooth-L1 training objective) is recorded alongside
    for provenance: a fine-tune can overfit loss while regressing
    joint error — exactly the failure the gate must catch.

    All candidates share ONE jitted eval step (params are call
    arguments, not compile-time constants), so comparing PTQ vs QAT
    costs a single executable — a per-candidate ``jax.jit`` would pay
    a duplicate multi-minute remote compile per comparison on the
    tunneled chip (CLAUDE.md)."""
    from awr_tpu.training.steps import make_eval_step

    model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                        dtype=DTYPES[cfg.compute_dtype],
                        quant_mode="int8")
    step = jax.jit(make_eval_step(model, cfg, quant=quant))
    dev_batches = [
        {"img": jnp.asarray(np.asarray(b["img"], np.float32)),
         "jt_uvd": jnp.asarray(np.asarray(b["jt_uvd"], np.float32))}
        for b in batches
    ]
    out = []
    for params, batch_stats in candidates:
        tot_loss, tot_err, n = 0.0, 0.0, 0
        for batch in dev_batches:
            m = step(params, batch_stats, batch)
            nb = len(batch["img"])
            err = np.linalg.norm(
                np.asarray(m["jt_uvd_pred"], np.float64)
                - np.asarray(batch["jt_uvd"], np.float64), axis=-1)
            tot_loss += float(m["loss"]) * nb
            tot_err += float(err.mean()) * nb
            n += nb
        out.append(dict(loss=tot_loss / max(n, 1),
                        joint_err=tot_err / max(n, 1)))
    return out


def int8_holdout_loss(cfg: Config, quant,
                      batches: Sequence[Dict[str, np.ndarray]],
                      *candidates) -> list:
    """Back-compat wrapper over :func:`int8_holdout_metrics`: mean
    eval-mode LOSS per candidate.  The QAT fallback gate itself scores
    ``joint_err`` (the mm proxy), not this."""
    return [m["loss"] for m in
            int8_holdout_metrics(cfg, quant, batches, *candidates)]
