"""Resume-finish a convergence_run whose process died mid-run.

The Trainer auto-restores the newest committed checkpoint in the
workdir and trains the remaining epochs; the untrained-baseline MPE is
taken from the original run's epoch-0 dump (``test_<MPE>.txt``, the
reference filename convention) since the restored model is no longer
untrained.  Everything else matches benchmarks/convergence_run.py.

Usage: python benchmarks/resume_convergence.py --net resnet_50
       --workdir runs/r02c_resnet50_conv --out runs/...json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--net", default="resnet_50")
    ap.add_argument("--epochs", type=int, default=125)
    ap.add_argument("--train-size", type=int, default=512)
    ap.add_argument("--test-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--coord-weight", type=float, default=0.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--int8-eval", action="store_true")
    args = ap.parse_args()

    from awr_tpu.config import Config
    from awr_tpu.data.synthetic import SyntheticHandDataset
    from awr_tpu.training.trainer import Trainer

    # init MPE from the original run's epoch-0 prediction dump filename
    dumps = glob.glob(os.path.join(args.workdir, "test_*.txt"))
    assert dumps, f"no epoch-0 dump in {args.workdir} to recover init MPE"
    init_mpe = max(float(re.search(r"test_([0-9.]+)\.txt",
                                   os.path.basename(d)).group(1))
                   for d in dumps)

    ks = 1.0 if args.net.startswith("resnet") else 0.4
    cfg = Config(net=args.net, kernel_size=ks, img_size=128,
                 batch_size=32, vis_freq=0, print_freq=1000,
                 max_epoch=args.epochs, step=100, lr=args.lr,
                 coord_weight=args.coord_weight,
                 exp_id=f"convergence_{args.net}",
                 ckpt_max_to_keep=2)
    train = SyntheticHandDataset(args.train_size, cfg.jt_num, 128,
                                 phase="train", seed=0, layout="grid")
    test = SyntheticHandDataset(args.test_size, cfg.jt_num, 128,
                                phase="test", seed=1, layout="grid")
    tr = Trainer(cfg, train, test, workdir=args.workdir)  # auto-restore
    resumed_from = tr.best_records["epoch"]
    print(f"resumed at epoch {resumed_from}; continuing to {args.epochs}")

    t0 = time.time()
    tr.train()
    final_mpe = tr.best_records["MPE"]
    wall = time.time() - t0

    int8_metrics = {}
    if args.int8_eval:
        import itertools

        import jax

        from awr_tpu.models import build_model
        from awr_tpu.models.quant import calibrate
        from awr_tpu.training.steps import make_eval_step

        fp_final_mpe, _ = tr.test(epoch=-3)
        cal = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                          quant_mode="calib")
        calib_imgs = [tr._pad(x)[0]["img"] for x in
                      itertools.islice(train.batches(32), 4)]
        quant = calibrate(cal, tr.state.params, tr.state.batch_stats,
                          calib_imgs, percentile=99.99)
        q8 = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                         quant_mode="int8")
        tr._eval_step = jax.jit(make_eval_step(q8, cfg, quant=quant))
        int8_mpe, _ = tr.test(epoch=-2)
        int8_metrics = dict(
            final_state_fp_mpe_mm=round(float(fp_final_mpe), 3),
            final_state_int8_mpe_mm=round(float(int8_mpe), 3),
            int8_mpe_delta_mm=round(float(int8_mpe - fp_final_mpe), 3))
    tr.close()

    improvement = init_mpe / final_mpe
    result = dict(net=args.net, epochs=args.epochs,
                  steps=args.epochs * (args.train_size // 32),
                  init_test_mpe_mm=round(float(init_mpe), 3),
                  final_test_mpe_mm=round(float(final_mpe), 3),
                  improvement_x=round(float(improvement), 1),
                  best_epoch=tr.best_records["best_epoch"],
                  resumed_from_epoch=int(resumed_from),
                  wall_s=round(wall, 1), **int8_metrics)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    assert improvement >= 10.0, (
        f"convergence regression: only {improvement:.1f}x "
        f"({init_mpe:.1f} -> {final_mpe:.1f} mm)")


if __name__ == "__main__":
    main()
