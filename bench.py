"""Headline benchmark: NYU-sized depth-frame inference throughput on one
TPU chip (forward + AWR adaptive decode), vs the PyTorch-CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

Baseline provenance: the upstream PyTorch implementation (ResNet18-deconv
+ FeatureModule.offset2joint_softmax, batch 32, fp32) measured on this
box's host CPU (1 core, torch single-thread): 6.72 frames/sec.
(BASELINE.md target: >10x PyTorch-CPU on one v5e chip.)
"""

from __future__ import annotations

import json
import time

PYTORCH_CPU_FPS = 6.72  # measured 2026-08-16 on this host, see docstring

BATCH = 128
IMG = 128
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.config import resnet_config
    from awr_tpu.models import build_model
    from awr_tpu.ops.decode import decode_offsets

    cfg = resnet_config(18, compute_dtype="bfloat16")
    on_tpu = jax.default_backend() == "tpu"
    model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                        dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 1)), train=True)

    @jax.jit
    def infer(params, batch_stats, img):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          img[..., None], train=False)
        jt = decode_offsets(out, img, cfg.kernel_size,
                            use_pallas=on_tpu)
        # bit-perturb the next input so successive calls form a true
        # dependency chain with distinct inputs (defeats any caching of
        # identical dispatches in the runtime/tunnel)
        return jt, img * 1.000001

    rng = np.random.RandomState(0)
    img = jnp.asarray(
        rng.uniform(-1, 1, (BATCH, IMG, IMG)).astype(np.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]

    for _ in range(WARMUP):
        jt, img = infer(params, batch_stats, img)
        jt.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jt, img = infer(params, batch_stats, img)
    jt.block_until_ready()
    dt = time.perf_counter() - t0
    fps = BATCH * ITERS / dt

    print(json.dumps({
        "metric": "nyu_resnet18_infer_throughput_1chip",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / PYTORCH_CPU_FPS, 1),
    }))


if __name__ == "__main__":
    main()
