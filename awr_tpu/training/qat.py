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

The default budget is GAP-SCALED (:func:`gap_scaled_recipe`): measure
the PTQ delta on held-out data first, then fine-tune with a budget
matched to it — an aggressive recipe on an already-small gap overfits
the tuning set and makes int8 WORSE (measured on hourglass_1).

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
    """The default QAT budget, scaled to the PTQ gap being recovered.

    Returns ``(steps, lr)``.  Measured provenance (both runs on chip,
    committed):

    - **Large gap** (resnet_18, PTQ +0.129 mm): 500 steps @ 1e-4 closed
      the gap and kept improving past the fp model
      (runs/convergence_qat_r02.json).
    - **Small gap** (hourglass_1, PTQ +0.072 mm): the same aggressive
      recipe OVERFIT the tuning set and scored WORSE held-out
      (0.742 -> 0.802); 100 steps @ 1e-5 landed at +0.003
      (runs/convergence_qat_hourglass_r02{,b}.json).

    The regime boundary is set at 0.1 mm — between the two measured
    gaps.  When the weights are already near the int8 grid there is
    little signal to learn and a lot of tuning-set noise to memorize,
    so the budget must shrink with the gap.  Callers that know their
    PTQ delta (eval on held-out data with ``quant_mode='int8'`` before
    and after :func:`awr_tpu.models.quant.calibrate`) should use this
    instead of hand-picking ``steps``/``lr``;
    ``benchmarks/convergence_run.py --qat-auto`` is the worked example.
    """
    if ptq_delta_mm >= 0.1:
        return 500, 1e-4
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
      lr: fine-tune learning rate (default 1e-4, a tenth of the
        reference recipe's 1e-3 — the task is adaptation, not
        training).
        Scale BOTH to the PTQ gap being recovered:
        :func:`gap_scaled_recipe` codifies the measured default
        (large gap -> 500 @ 1e-4, small gap -> 100 @ 1e-5; see its
        docstring for the on-chip provenance).
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
