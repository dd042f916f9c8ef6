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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nets", default="resnet_18,hourglass_1")
    ap.add_argument("--batches", default="32,128,512")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    for net in args.nets.split(","):
        for b in args.batches.split(","):
            res = run_one(net.strip(), int(b), args.dtype)
            print(json.dumps(res))


if __name__ == "__main__":
    main()
