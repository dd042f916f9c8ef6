"""Optimizers and LR schedules with torch-matching semantics.

Reference parity: train.py:66-69 (Adam | SGD(momentum 0.9), both with
coupled L2 weight decay) and train.py:89-92 (StepLR gamma 0.1 |
ReduceLROnPlateau(min, patience=2, min_lr=1e-8)).

The learning rate is injected via ``optax.inject_hyperparams`` so the
host-side scheduler can set it per epoch (exactly like torch schedulers
mutating param_group lr) without recompiling the jitted step.
"""

from __future__ import annotations

import optax


def make_optimizer(name: str, weight_decay: float = 0.0):
    """Returns an inject_hyperparams-wrapped optax transform with a
    mutable ``learning_rate`` hyperparameter."""

    def tx(learning_rate):
        parts = []
        if weight_decay:
            # torch couples decay into the gradient *before* the adaptive
            # scaling (unlike AdamW) — add_decayed_weights first.
            parts.append(optax.add_decayed_weights(weight_decay))
        if name == "adam":
            parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        elif name == "sgd":
            parts.append(optax.trace(decay=0.9, nesterov=False))
        else:
            raise ValueError(f"unknown optimizer {name!r}")
        parts.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*parts)

    return optax.inject_hyperparams(tx)


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning rate (host-side, between steps)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def step_lr(base_lr: float, epoch: int, step_size: int,
            gamma: float = 0.1) -> float:
    """torch StepLR as the reference schedules it: ``scheduler.step(e)``
    runs at the END of epoch e (train.py:160), so 1-based epoch E trains
    at ``base * gamma^((E-1) // step_size)`` — epoch 30 still runs at
    full lr with the NYU step=30 recipe; epoch 31 is the first decayed
    one."""
    return base_lr * gamma ** ((epoch - 1) // step_size)


class PlateauScheduler:
    """torch ReduceLROnPlateau('min', patience=2, factor=0.1, min_lr=1e-8)
    (reference train.py:90): after ``patience`` epochs without improvement
    the lr is multiplied by ``factor``."""

    def __init__(self, base_lr: float, factor: float = 0.1,
                 patience: int = 2, min_lr: float = 1e-8,
                 threshold: float = 1e-4):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr
