"""Training CLI (reference train.py equivalent).

Usage:
  python -m awr_tpu.training.train --synthetic --epochs 2   # offline smoke
  python -m awr_tpu.training.train --data-dir ./data/nyu    # real NYU recipe
"""

from __future__ import annotations

import argparse

from awr_tpu.training.evaluate import (
    add_common_args,
    build_config,
    make_datasets,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--epochs", type=int, default=0,
                    help="override max_epoch (default: dataset recipe)")
    ap.add_argument("--lr", type=float, default=0.0)
    ap.add_argument("--optimizer", default="")
    ap.add_argument("--scheduler", default="")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="split each batch into N microbatches inside "
                         "the jitted step (one optimizer update, ~N-fold "
                         "lower peak activation HBM)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize backbone blocks in the backward "
                         "pass (recompute instead of store activations)")
    ap.add_argument("--step-timeout", type=float, default=0.0,
                    help="stall watchdog: exit 86 if no train/eval step "
                         "completes for this many seconds (run under "
                         "awr_tpu.training.supervise to auto-resume from "
                         "the last checkpoint); 0 = off")
    args = ap.parse_args(argv)
    cfg = build_config(args)
    over = {}
    if args.epochs:
        over["max_epoch"] = args.epochs
    if args.lr:
        over["lr"] = args.lr
    if args.optimizer:
        over["optimizer"] = args.optimizer
    if args.scheduler:
        over["scheduler"] = args.scheduler
    if args.grad_accum > 1:
        over["grad_accum"] = args.grad_accum
    if args.remat:
        over["remat"] = True
    if args.step_timeout:
        over["step_timeout_s"] = args.step_timeout
    cfg = cfg.replace(**over)

    from awr_tpu.training.trainer import Trainer

    train, test = make_datasets(args, cfg, train=True)
    trainer = Trainer(cfg, train_data=train, test_data=test)
    if args.profile_dir:
        from awr_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            trainer.train()
    else:
        trainer.train()
    trainer.close()


if __name__ == "__main__":
    main()
