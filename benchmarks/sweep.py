"""Large-batch inference throughput sweep (BASELINE.json config 5).

Times forward+decode across backbones and batch sizes with chained,
bit-distinct inputs (defeating runtime caching of identical dispatches).

Usage: python benchmarks/sweep.py [--nets resnet_18,hourglass_1]
       [--batches 32,128,512] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python benchmarks/sweep.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_one(net: str, batch: int, dtype_name: str, img: int = 128,
            iters: int = 20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.config import hourglass_config, resnet_config
    from awr_tpu.models import build_model
    from awr_tpu.ops.decode import decode_offsets

    if net.startswith("resnet"):
        cfg = resnet_config(int(net.split("_")[1]))
    else:
        cfg = hourglass_config(int(net.split("_")[1]))
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = build_model(cfg.net, cfg.jt_num, cfg.downsample, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img, img, 1)), train=True)
    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def infer(params, batch_stats, x):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          x[..., None], train=False)
        if out.ndim == 5:
            out = out[-1]
        jt = decode_offsets(out, x, cfg.kernel_size, use_pallas=on_tpu)
        return jt, x * 1.000001

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, img, img))
                    .astype(np.float32))
    p, bs = variables["params"], variables["batch_stats"]
    jt, x = infer(p, bs, x)
    jt.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        jt, x = infer(p, bs, x)
    jt.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dict(net=net, batch=batch, dtype=dtype_name,
                ms_per_batch=round(dt * 1e3, 3),
                frames_per_sec=round(batch / dt, 1))


def run_train_one(net: str, batch: int, dtype_name: str, img: int = 128,
                  iters: int = 20):
    """Full train-step timing (encode + fwd + bwd + Adam update)."""
    import tempfile

    import jax
    import numpy as np

    from awr_tpu.config import Config
    from awr_tpu.data.synthetic import SyntheticHandDataset
    from awr_tpu.training.trainer import Trainer
    import time as _t

    ks = 1.0 if net.startswith("resnet") else 0.4
    cfg = Config(net=net, kernel_size=ks, img_size=img, batch_size=batch,
                 vis_freq=0, use_pallas=True, print_freq=10**9,
                 compute_dtype=dtype_name, matmul_precision="default")
    ds = SyntheticHandDataset(batch, cfg.jt_num, img, phase="train",
                              seed=0)
    tr = Trainer(cfg, ds, workdir=tempfile.mkdtemp(prefix="awr_bench_"))
    b, _ = tr._pad(next(ds.batches(batch)))
    dev = tr._put(b)
    tr.state, m = tr._train_step(tr.state, dev)
    jax.block_until_ready(m["loss"])
    t0 = _t.perf_counter()
    for _ in range(iters):
        tr.state, m = tr._train_step(tr.state, dev)
    jax.block_until_ready(m["loss"])
    dt = (_t.perf_counter() - t0) / iters
    tr.close()
    return dict(net=net, batch=batch, dtype=dtype_name, mode="train",
                ms_per_step=round(dt * 1e3, 3),
                frames_per_sec=round(batch / dt, 1))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nets", default="resnet_18,hourglass_1")
    ap.add_argument("--batches", default="32,128,512")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="also time full train steps")
    args = ap.parse_args()
    for net in args.nets.split(","):
        for b in args.batches.split(","):
            res = run_one(net.strip(), int(b), args.dtype)
            print(json.dumps(res))
            if args.train:
                print(json.dumps(run_train_one(net.strip(), int(b),
                                               args.dtype)))


if __name__ == "__main__":
    main()
