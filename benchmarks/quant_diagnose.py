"""Diagnose a post-training-int8 accuracy regression on a TRAINED model.

Evaluates the same restored checkpoint under: fp (sanity), weights-only
int8 (isolates per-channel weight rounding), and full int8 with the
activation scales calibrated at max / p99.99 / p99.9 / p99 (isolates
activation-outlier clipping).  Motivating case: the trained resnet_50
lost 22 mm MPE under max-calibrated int8 while resnet_18 lost 0.3 mm —
this script attributes the loss and picks the calibration that fixes it.

Usage: python benchmarks/quant_diagnose.py --net resnet_50
       --workdir runs/r02c_resnet50_conv --out runs/quant_diag.json
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--net", default="resnet_50")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--train-size", type=int, default=512)
    ap.add_argument("--test-size", type=int, default=64)
    ap.add_argument("--percentiles", default="100,99.99,99.9,99")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from awr_tpu.config import Config
    from awr_tpu.data.synthetic import SyntheticHandDataset
    from awr_tpu.models import build_model
    from awr_tpu.models.quant import calibrate
    from awr_tpu.training.steps import make_eval_step
    from awr_tpu.training.trainer import Trainer

    ks = 1.0 if args.net.startswith("resnet") else 0.4
    cfg = Config(net=args.net, kernel_size=ks, img_size=128,
                 batch_size=32, vis_freq=0, print_freq=1000,
                 exp_id=f"quantdiag_{args.net}", ckpt_max_to_keep=2)
    train = SyntheticHandDataset(args.train_size, cfg.jt_num, 128,
                                 phase="train", seed=0, layout="grid")
    test = SyntheticHandDataset(args.test_size, cfg.jt_num, 128,
                                phase="test", seed=1, layout="grid")
    tr = Trainer(cfg, train, test, workdir=args.workdir)  # auto-restore
    assert int(tr.state.step) > 0, "no trained checkpoint in workdir"

    calib_imgs = [tr._pad(x)[0]["img"] for x in
                  itertools.islice(train.batches(32), 4)]
    rows = {}

    def eval_mode(tag, model, quant=None):
        tr._eval_step = jax.jit(make_eval_step(model, cfg, quant=quant))
        mpe, _ = tr.test(epoch=-9)
        rows[tag] = round(float(mpe), 3)
        print(f"[{tag}] held-out MPE {mpe:.3f} mm", flush=True)

    eval_mode("fp", build_model(cfg.net, cfg.jt_num, cfg.downsample))
    eval_mode("int8_weights_only",
              build_model(cfg.net, cfg.jt_num, cfg.downsample,
                          quant_mode="int8_w"))
    q8 = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                     quant_mode="int8")
    for pct in (float(p) for p in args.percentiles.split(",")):
        cal = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                          quant_mode="calib")
        quant = calibrate(cal, tr.state.params, tr.state.batch_stats,
                          calib_imgs, percentile=pct)
        eval_mode(f"int8_p{pct:g}", q8, quant=quant)
    tr.close()

    result = dict(net=args.net, **rows)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
