"""Same-process A/B of the hourglass nearest-upsample spelling.

Round-5 finding: the batch-512 hourglass inference trace
(runs/trace_r04_hg) shows ~3.6 GB/iter of materialized
``broadcast_in_dim`` traffic from the two-``jnp.repeat`` upsample
spelling (models/common.py) — the (N,2H,W,C) intermediate is written
to HBM and re-read on a family that is HBM-bandwidth-bound by
structure (BENCH_NOTES_r04.md §1).  The single ``broadcast_in_dim``
to (N,H,2,W,2,C) + reshape spelling removes the intermediate.

This script times BOTH spellings interleaved (A,B,A,B) in one process
on the chip so the comparison is immune to the transport's hours-scale
throughput variance (CLAUDE.md): only the within-process ratio is the
result.  Methodology per BENCH_METHODOLOGY.md via sweep.run_infer
(salted inputs, serial lax.scan chains, host-materialized checksums,
linearity gate, MFU ceiling).

Usage: python benchmarks/upsample_ab.py [--batch 512] [--reps 2]
Appends one JSON row per measurement to benchmarks/upsample_ab_r05.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def repeat_spelling(x):
    """The pre-r05 two-materialized-broadcast spelling (control)."""
    import jax.numpy as jnp

    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=2,
                    help="interleaved repetitions per spelling")
    ap.add_argument("--net", default="hourglass_1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "upsample_ab_r05.jsonl"))
    args = ap.parse_args()

    import sweep
    from awr_tpu.models import common, hourglass

    broadcast_spelling = common.upsample_nearest_2x
    rows = []
    for rep in range(args.reps):
        for label, fn in (("repeat2", repeat_spelling),
                          ("broadcast1", broadcast_spelling)):
            hourglass.upsample_nearest_2x = fn
            row = sweep.run_infer(args.net, args.batch, "bfloat16")
            row.update(spelling=label, rep=rep)
            rows.append(row)
            print(json.dumps(row), flush=True)
    hourglass.upsample_nearest_2x = broadcast_spelling

    by = {}
    for r in rows:
        by.setdefault(r["spelling"], []).append(r["ms_per_batch"])
    if len(by) == 2:
        a = min(by["repeat2"])
        b = min(by["broadcast1"])
        summary = dict(spelling_ab="repeat2/broadcast1",
                       best_repeat2_ms=a, best_broadcast1_ms=b,
                       speedup=round(a / b, 4))
        rows.append(summary)
        print(json.dumps(summary), flush=True)

    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
