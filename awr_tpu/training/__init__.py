"""Train/eval drivers (reference train.py, test.py re-designed as jitted
functional steps around a thin host loop)."""

from awr_tpu.training.trainer import Trainer  # noqa: F401
