"""Tracing and step timing (TPU-native replacement for SURVEY.md section 5.1).

The reference's only observability is tqdm progress bars and ptflops
one-off MACs prints; here:

- :func:`trace` wraps a block in a ``jax.profiler`` trace whose artifact
  loads in Perfetto/XProf/TensorBoard;
- :class:`StepTimer` measures wall-per-step with ``block_until_ready``
  semantics and keeps a rolling summary;
- :func:`flops_of` asks XLA's cost model for the FLOPs of a jitted
  callable (ptflops-equivalent, exact for the compiled graph).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/tb'): step()`` -> profiler artifact in log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timer; call ``tick(result)`` once per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self, result: Any = None) -> float:
        """Blocks on ``result`` (if given) and records elapsed seconds."""
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return dict(mean_s=float(arr.mean()),
                    p50_s=float(np.median(arr)),
                    p95_s=float(np.percentile(arr, 95)),
                    steps_per_s=float(1.0 / max(arr.mean(), 1e-12)))


def flops_of(fn: Callable, *example_args) -> Optional[float]:
    """FLOPs of the compiled graph of ``fn(*example_args)`` (or None if
    the backend does not expose a cost model)."""
    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):  # older jax returns [dict]
            analysis = analysis[0]
        return float(analysis.get("flops")) if analysis else None
    except Exception:
        return None


# bf16 systolic-array peak per chip, by device_kind substring.  The ONE
# table every benchmark harness shares (bench.py, benchmarks/sweep.py,
# benchmarks/profile_check.py) so the mandatory implied-MFU ceiling
# (BENCH_METHODOLOGY.md) cannot drift between copies.  Used only as a
# sanity CEILING (refuse impossible numbers), never as a target.
CHIP_PEAK_FLOPS = {
    "v5 lite": 197e12,  # TPU v5e datasheet bf16
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6": 918e12,  # trillium
}
DEFAULT_PEAK_FLOPS = 197e12


def chip_peak(device=None) -> float:
    """Datasheet bf16 peak FLOP/s for ``device`` (default: devices()[0])."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in CHIP_PEAK_FLOPS.items():
        if key in kind:
            return peak
    return DEFAULT_PEAK_FLOPS


def implied_mfu(fps: float, flops_per_frame: float,
                device=None) -> float:
    """Model FLOPs utilization implied by a throughput measurement.

    >= 1.0 is physically impossible — harnesses must REFUSE to report
    such a number (the round-1 failure mode BENCH_METHODOLOGY.md bans).
    """
    return fps * flops_per_frame / chip_peak(device)
