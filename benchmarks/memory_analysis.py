"""Compile-time peak-HBM analysis of the train step vs remat/grad_accum.

The tunneled device exposes no runtime ``memory_stats()``, so this uses
the XLA compiler's own memory plan (``compiled.memory_analysis()``):
``temp_size_in_bytes`` is the activation/workspace arena the executable
will reserve — exactly what Config.remat (recompute activations) and
Config.grad_accum (microbatch the batch axis) exist to shrink.  AOT
lower+compile only; nothing is dispatched, so chip timing runs are not
disturbed.

Usage:
  python benchmarks/memory_analysis.py --net resnet_18 --batch 256
  python benchmarks/memory_analysis.py --net hourglass_2 --batch 128 \
      --out benchmarks/memory_r02.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def analyze(net: str, batch: int, img_size: int, dtype: str,
            remat: bool, grad_accum: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.config import Config
    from awr_tpu.models import build_model
    from awr_tpu.training.optim import make_optimizer
    from awr_tpu.training.steps import TrainState, make_train_step

    cfg = Config(net=net, batch_size=batch, img_size=img_size,
                 compute_dtype=dtype, use_pallas=False,
                 remat=remat, grad_accum=grad_accum, mesh_devices=1)
    model = build_model(net, cfg.jt_num, cfg.downsample,
                        dtype={"float32": jnp.float32,
                               "bfloat16": jnp.bfloat16}[dtype],
                        remat=remat)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((1, img_size, img_size, 1), jnp.float32),
        train=True)
    optimizer = make_optimizer(cfg.optimizer)(learning_rate=cfg.lr)
    state = TrainState(variables["params"], variables["batch_stats"],
                       optimizer.init(variables["params"]),
                       jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, optimizer, cfg), donate_argnums=0)

    g = np.random.RandomState(0)
    batch_arrs = dict(
        img=jnp.asarray(g.uniform(-1, 1, (batch, img_size, img_size)),
                        jnp.float32),
        jt_uvd=jnp.asarray(g.uniform(-0.5, 0.5, (batch, cfg.jt_num, 3)),
                           jnp.float32),
    )
    row = dict(net=net, batch=batch, img_size=img_size, dtype=dtype,
               remat=remat, grad_accum=grad_accum,
               backend=jax.devices()[0].platform)
    try:
        mem = step.lower(state, batch_arrs).compile().memory_analysis()
    except Exception as e:
        # on TPU, a memory plan exceeding HBM fails AT COMPILE — record
        # it: "plain OOMs where the levers fit" is the enablement claim
        msg = str(e)
        row["compile_error"] = (msg[:300] + "...") if len(msg) > 300 \
            else msg
        row["oom"] = ("RESOURCE_EXHAUSTED" in msg or "emory" in msg)
        return row
    if mem is None:
        row["error"] = "memory_analysis unavailable on this backend"
        return row
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        row[k.replace("_in_bytes", "_mb")] = round(
            getattr(mem, k) / 2**20, 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="resnet_18")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--cpu", action="store_true",
                    help="analyze the CPU backend's plan (no remote "
                         "TPU compiles; arena ratios are comparable)")
    ap.add_argument("--enablement", action="store_true",
                    help="compile ONLY plain vs remat+grad_accum at "
                         "--batch: shows a batch where the plain step "
                         "exceeds HBM (compile fails) while the levers "
                         "fit")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import time

    variants = ([(False, 1), (True, 8)] if args.enablement
                else [(False, 1), (True, 1), (False, 4), (True, 4)])
    rows = []
    for remat, ga in variants:
        t0 = time.time()
        row = analyze(args.net, args.batch, args.img_size, args.dtype,
                      remat, ga)
        row["compile_s"] = round(time.time() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    base = next(r for r in rows
                if not r["remat"] and r["grad_accum"] == 1)
    if "temp_size_mb" in base:
        for r in rows[1:]:
            if "temp_size_mb" in r:
                print(f"# temp arena {r['remat']=} {r['grad_accum']=}: "
                      f"{r['temp_size_mb']:.0f} MB = "
                      f"{r['temp_size_mb'] / base['temp_size_mb']:.2f}x"
                      f" of plain ({base['temp_size_mb']:.0f} MB)",
                      file=sys.stderr)
    if args.out:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
