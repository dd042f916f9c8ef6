"""Headline benchmark: NYU-sized depth-frame inference throughput on one
TPU chip (ResNet18-deconv forward + AWR adaptive decode), vs the
PyTorch-CPU reference loop (reference test.py:67-97).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

Methodology (see BENCH_METHODOLOGY.md; fixes the round-1 harness whose
numbers implied >100% MFU):

1. RUN-UNIQUE INPUTS.  The initial batch is salted with os.urandom so no
   dispatch in this run can be served from the tunnel's memoization
   cache (CLAUDE.md: identical executable + input bits -> cached result;
   a deterministic chain is memoizable END TO END across runs).
2. SERIAL ON-DEVICE CHAIN.  Each jitted call runs K forward+decode
   iterations under lax.scan, every iteration's input derived from the
   previous iteration's OUTPUT (joints fed back into the image), so XLA
   cannot parallelize or elide any step.
3. HOST MATERIALIZATION.  Each outer call returns a checksum that
   depends on every decoded joint of every inner iteration; the timing
   loop converts it with float() — the bits cannot exist on host without
   the full chain having executed.
4. LINEARITY GATE.  The measurement runs at N and 2N outer iterations;
   if wall time does not scale ~linearly the run is rejected (dispatch
   round-trip artifacts, not compute, would dominate such a run).
5. MFU CEILING.  Implied FLOP/s = fps x per-frame FLOPs (XLA cost
   model, utils/profiling.flops_of).  If that exceeds the chip's
   datasheet peak the harness REFUSES to print a throughput number.

Baseline provenance: benchmarks/torch_cpu_baseline.py runs the upstream
PyTorch implementation (ResNet18-deconv +
FeatureModule.offset2joint_softmax, batch 32, fp32, single thread) on
this host's CPU.  Re-measure with:
  python benchmarks/torch_cpu_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

# re-measured 2026-08-16: `python benchmarks/torch_cpu_baseline.py`
# -> 9.59 fps (batch 32, fp32, 1 thread).  Round-1's 6.72 was not
# reproducible; we keep the HIGHER (conservative-for-us) measurement.
PYTORCH_CPU_FPS = 9.59

# Tunable via env for sweeps (defaults are the recorded headline config).
# batch x INNER sweep on chip (fps): 512x8 13,480 / 512x16 14,064 /
# 1024x8 13,992 / 1024x16 14,364 / 1024x32 14,577 / 1024x64 14,680 /
# 2048x8 14,010 / 2048x16 14,274 — batch 1024 with 64-deep chains is
# the measured optimum (longer chains amortize the ~26 ms/dispatch
# tunnel round-trip; gains asymptote <1% past 64, BENCH_NOTES_r02.md).
BATCH = int(os.environ.get("AWR_BENCH_BATCH", 1024))
IMG = 128
# serial forward+decode iterations per jitted call
INNER = int(os.environ.get("AWR_BENCH_INNER", 64))
OUTER = int(os.environ.get("AWR_BENCH_OUTER", 2))
WARMUP = 2

def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from awr_tpu.config import resnet_config
    from awr_tpu.models import build_model
    from awr_tpu.ops.decode import decode_offsets
    # chip-peak table + MFU ceiling live in ONE place shared with
    # benchmarks/sweep.py and profile_check.py (no drifting copies)
    from awr_tpu.utils.profiling import chip_peak, flops_of

    cfg = resnet_config(18, compute_dtype="bfloat16")
    model = build_model(cfg.net, cfg.jt_num, cfg.downsample,
                        dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 1)), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def forward_decode(img):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          img[..., None], train=False)
        # XLA-fused decode: measured faster than the Pallas kernel since
        # the contraction rewrite (see Config.use_pallas comment)
        return decode_offsets(out, img, cfg.kernel_size,
                              use_pallas=cfg.use_pallas)

    @jax.jit
    def chained(img):
        # INNER serial iterations; input i+1 depends on output i, so the
        # whole chain must execute to produce the checksum.
        def body(carry, _):
            jt = forward_decode(carry)
            nxt = carry * 0.999999 + jnp.sum(jt) * 1e-9
            return nxt, jnp.sum(jt)
        img_out, sums = jax.lax.scan(body, img, None, length=INNER)
        return img_out, jnp.sum(sums)

    # run-unique salt: defeats cross-run memoization of the whole chain
    salt = int.from_bytes(os.urandom(4), "little") / 2.0**32
    rng = np.random.RandomState(0)
    base = rng.uniform(-1, 1, (BATCH, IMG, IMG)).astype(np.float32)
    img = jnp.asarray(base + np.float32(salt * 1e-3))

    for _ in range(WARMUP):
        img, s = chained(img)
        float(s)

    def measure(n_outer, img):
        checksum = 0.0
        t0 = time.perf_counter()
        for _ in range(n_outer):
            img, s = chained(img)
            checksum += float(s)  # host materialization: forces execution
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        return dt, img

    dt1, img = measure(OUTER, img)
    dt2, img = measure(2 * OUTER, img)

    # linearity gate: doubled work must take ~double the time
    ratio = dt2 / dt1
    if not 1.5 <= ratio <= 2.7:
        print(f"REFUSED: non-linear scaling (2x iters -> {ratio:.2f}x "
              f"time); timings are dispatch artifacts, not compute",
              file=sys.stderr)
        sys.exit(1)

    frames = BATCH * INNER * (OUTER + 2 * OUTER)
    fps = frames / (dt1 + dt2)

    # MFU ceiling: refuse physically impossible numbers.  The gate is
    # MANDATORY — if the XLA cost model is unavailable we refuse to
    # print an unguarded headline rather than silently skip the check
    # (skipping is exactly the round-1 failure mode this exists for).
    # The count comes from the ALREADY-COMPILED chained executable (the
    # exact program that was timed; its HLO is cached by the compile
    # helper, so no second remote compile).  The XLA cost model counts a
    # lax.scan body ONCE regardless of trip count (verified in
    # benchmarks/sweep.py::_compiled_flops), so the per-call number IS
    # the per-iteration (one forward+decode batch) number.
    fl = flops_of(chained, img)
    if not fl:
        print("REFUSED: XLA cost model returned no FLOP count "
              "(utils/profiling.flops_of); cannot evaluate the MFU "
              "ceiling, so no throughput number is printed",
              file=sys.stderr)
        sys.exit(1)
    flops_per_frame = fl / BATCH
    peak = chip_peak(jax.devices()[0])
    mfu = fps * flops_per_frame / peak
    if mfu >= 1.0:
        print(f"REFUSED: implied MFU {mfu:.1%} >= 100% of "
              f"{peak/1e12:.0f} TFLOPS peak "
              f"({flops_per_frame/1e9:.2f} GFLOP/frame x "
              f"{fps:.0f} fps); timing harness is broken",
              file=sys.stderr)
        sys.exit(1)
    print(f"sanity: {flops_per_frame/1e9:.2f} GFLOP/frame, "
          f"implied MFU {mfu:.1%}, scaling ratio {ratio:.2f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "nyu_resnet18_infer_throughput_1chip",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / PYTORCH_CPU_FPS, 1),
    }))


if __name__ == "__main__":
    main()
