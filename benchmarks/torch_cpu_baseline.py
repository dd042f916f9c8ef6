"""Reproduce the PyTorch-CPU baseline number hard-coded in bench.py.

Runs the UPSTREAM reference implementation (mounted read-only at
/root/reference) as a black box: ResNet18-deconv forward +
FeatureModule.offset2joint_softmax — the per-batch device math of the
reference eval loop (reference test.py:67-97) — at batch 32, fp32,
single CPU thread, and prints frames/sec.

Usage:  python benchmarks/torch_cpu_baseline.py [--batch 32] [--iters 10]

This is the denominator of bench.py's ``vs_baseline`` (PYTORCH_CPU_FPS);
re-run it whenever the host changes.  Requires the reference mount; the
reference code is imported, never copied.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    if not os.path.isdir(REF):
        print(f"reference mount not found at {REF}", file=sys.stderr)
        sys.exit(2)
    sys.path.insert(0, REF)

    import numpy as np
    import torch

    torch.set_num_threads(1)

    from model.resnet_deconv import get_deconv_net
    from util.feature_tool import FeatureModule

    net = get_deconv_net(18, 14, 2)
    net.eval()
    FM = FeatureModule()

    g = np.random.RandomState(0)
    imgs = [
        torch.from_numpy(
            g.uniform(-1, 1, (args.batch, 1, args.img, args.img))
            .astype(np.float32))
        for _ in range(args.warmup + args.iters)
    ]

    with torch.no_grad():
        for t in imgs[:args.warmup]:
            FM.offset2joint_softmax(net(t), t, 1.0)
        t0 = time.perf_counter()
        acc = 0.0
        for t in imgs[args.warmup:]:
            jt = FM.offset2joint_softmax(net(t), t, 1.0)
            acc += float(jt.sum())  # materialize
        dt = time.perf_counter() - t0
    assert np.isfinite(acc)

    fps = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "pytorch_cpu_resnet18_infer_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "batch": args.batch,
        "threads": 1,
    }))


if __name__ == "__main__":
    main()
