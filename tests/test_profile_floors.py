"""Offline speed-of-light floors from the committed device traces.

``benchmarks/profile_check.py --floors`` turns a committed profiler
trace into whole-graph HBM/MXU/per-op-roofline floors (no chip needed).
These tests pin the parser and the floor math against the traces the
repo ships, including the physical invariant that measured on-device
time can never beat the per-op roofline — which is also the assertion
behind BENCH_NOTES_r04.md §4's "the headline graph runs within ~5% of
its per-op roofline" claim.
"""

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))

from profile_check import aggregate_floors  # noqa: E402

TRACES = [
    # (dir, inner, expected gb/iter, expected gflops/iter) — gb counts
    # each async copy-start/copy-done DMA once (aggregate_floors r05)
    ("runs/trace_r02", 8, 4.00, 913.9),           # resnet_18 b128 bf16
    ("runs/trace_r02_train", 8, 22.05, 2753.5),   # resnet_18 train b128
    ("runs/trace_r04_hg", 8, 50.99, 5810.6),      # hourglass_1 b512
    ("runs/trace_r04_hg_train", 8, 68.56, 4431.6),  # hourglass_1 train b128
    # hourglass_1 b512 after the single-broadcast upsample respelling
    # (BENCH_NOTES_r05.md §4): -1.42 GB/iter vs trace_r04_hg
    ("runs/trace_r05_hg", 8, 49.57, 5810.6),
    ("runs/trace_r05_hg_train", 8, 68.01, 4431.6),  # train, same respelling
    # + fused vec/ht output head (BENCH_NOTES_r05.md §5): one 1x1 conv
    # over concatenated kernels, one read of the 256-ch feature map
    ("runs/trace_r05_hg_head", 8, 48.07, 5810.7),
    ("runs/trace_r05_hg_train_head", 8, 67.63, 4429.6),  # train, both r05 spellings
]


@pytest.mark.parametrize("trace_dir,inner,gb,gf",
                         TRACES, ids=[t[0] for t in TRACES])
def test_floor_invariants_on_committed_traces(trace_dir, inner, gb, gf):
    path = os.path.join(ROOT, trace_dir)
    if not os.path.isdir(path):
        pytest.skip(f"{trace_dir} not in this checkout")
    f = aggregate_floors(path, inner=inner)
    assert f and f["n_ops"] > 0
    # the roofline floor is per-op max(bw, mxu) summed, so it must sit
    # between the best single-resource floor and their sum
    assert (max(f["hbm_floor_ms"], f["mxu_floor_ms"])
            <= f["roofline_floor_ms"] + 1e-6)
    assert (f["roofline_floor_ms"]
            <= f["hbm_floor_ms"] + f["mxu_floor_ms"] + 1e-6)
    # physics: measured on-device op time can never beat the roofline
    assert f["headroom"] >= 1.0
    # and the committed graphs are known to run CLOSE to it (a parser
    # regression that dropped or double-counted ops would break this)
    assert f["headroom"] < 1.3
    # pin the trace-derived totals (loose: reps-rounding class changes)
    assert f["gb_per_iter"] == pytest.approx(gb, rel=0.02)
    assert f["gflops_per_iter"] == pytest.approx(gf, rel=0.02)


def test_floors_empty_dir(tmp_path):
    assert aggregate_floors(str(tmp_path)) == {}
