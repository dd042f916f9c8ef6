"""Rematerialization as a SPEED lever on bandwidth-bound train steps.

Hypothesis (from the committed floors rows): the train steps are
HBM-bandwidth-bound with large MXU slack — hourglass_1 train b128 has
an 83 ms HBM floor vs a 22.5 ms MXU floor (3.7x), resnet_18 train
26.9 vs 14.0 (1.9x).  ``Config.remat`` (nn.remat per residual block /
hourglass stack) recomputes interior activations in the backward pass
instead of storing them, i.e. it converts HBM activation round-trips
into MXU work — which is nearly free exactly when the HBM/MXU floor
ratio is large.  The repo measured remat for MEMORY in r02
(0.34x temp arena); this measures it for TIME.

Same-process counterbalanced A/B (off,on / on,off per family) so the
within-process ratio is immune to the transport's hours-scale drift.
Methodology per BENCH_METHODOLOGY.md via sweep.run_train_chained
(serial scan chains through the optimizer state, salted inputs,
linearity gate, MFU ceiling).

Usage: python benchmarks/remat_speed_ab.py [--batch 128]
Appends rows to benchmarks/remat_speed_r05.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nets", nargs="*",
                    default=["hourglass_1", "resnet_18"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "remat_speed_r05.jsonl"))
    args = ap.parse_args()

    import sweep

    rows = []
    for net in args.nets:
        for rep, order in enumerate(((False, True), (True, False))):
            for remat in order:
                row = sweep.run_train_chained(
                    net, args.batch, "bfloat16", remat=remat)
                row["rep"] = rep
                rows.append(row)
                print(json.dumps(row), flush=True)
        best = {}
        for r in rows:
            if r["net"] != net:
                continue
            key = r["remat"]
            best[key] = min(best.get(key, 1e9), r["ms_per_step"])
        summary = dict(net=net, ab="remat_off/remat_on",
                       best_off_ms=best[False], best_on_ms=best[True],
                       speedup=round(best[False] / best[True], 4))
        rows.append(summary)
        print(json.dumps(summary), flush=True)

    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
