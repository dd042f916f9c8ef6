"""Chip benchmark: Pallas polyphase int8 deconv vs XLA's int8 conv
lowering (VERDICT r4 next-3 — the last order-unity perf lever).

Measures, per decoder deconv shape of the int8 resnet graph
(runs/trace_r03_int8 top ops):

- ``xla_int8``: the shipping spelling (models/quant.py
  QuantConvTranspose mode='int8': lhs-dilated conv, int32 accum) —
  runs at the bf16 FLOP rate (BENCH_NOTES_r03.md §2).
- ``pallas_concat`` / ``pallas_taps``: the Pallas polyphase kernel
  (ops/pallas_int8.py), im2col in VMEM feeding int8 MXU dots — the
  kernel-level attempt at the 212-TOPS double-rate path the r03 probe
  proved reachable via ``dot_general``.
- ``bf16``: the unquantized deconv, for the absolute reference.
- ``dot_probe``: pure Pallas int8 matmul at the polyphase shape
  (M = B.H.W per phase, K = 4.C_in, N = C_out) — the rate ceiling of
  the approach with zero conv machinery.

Timing per BENCH_METHODOLOGY.md: os.urandom-salted int8 inputs, a
serial lax.scan chain whose carry is perturbed from each output (no
dispatch is memoizable), host-materialized checksums, a 2x-work
linearity gate, and a hard refusal if any variant implies more than
the chip's 394 int8-TOPS peak.

Usage: python benchmarks/pallas_int8_deconv.py [--batch 512]
       [--shapes d2 d1 d0] [--inner 8] [--outer 4]
       [--out benchmarks/pallas_int8_r05.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

INT8_PEAK = 394e12  # v5e MXU int8 peak ops/s

# decoder deconv shapes of the int8 resnet graph at img 128 / ds 2
# (models/resnet.py; trace ops fusion.237 = d2, .57 = d1, .47 = d0)
SHAPES = {
    "d2": dict(h=32, w=32, cin=256, cout=256),
    "d1": dict(h=16, w=16, cin=256, cout=256),
    "d0": dict(h=8, w=8, cin=512, cout=256),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--shapes", nargs="+", default=["d2", "d1"],
                    choices=sorted(SHAPES))
    ap.add_argument("--variants", nargs="+",
                    default=["xla_int8", "pallas_concat",
                             "pallas_taps", "bf16", "dot_probe"])
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--outer", type=int, default=4)
    ap.add_argument("--out", default="benchmarks/pallas_int8_r05.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from awr_tpu.ops.pallas_int8 import deconv4x4s2_int8, int8_matmul

    salt = int.from_bytes(os.urandom(4), "little")
    rng = np.random.RandomState(salt % 2**31)
    rows = []

    def timed_chain(step_out_sum, x0, flops_per_iter, label):
        """step_out_sum: carry -> (next_carry, checksum scalar).
        Serial scan chain; linearity-gated; returns ms/iter."""

        @jax.jit
        def chained(x):
            def body(carry, _):
                nxt, s = step_out_sum(carry)
                return nxt, s
            x, sums = lax.scan(body, x, None, length=args.inner)
            return x, jnp.sum(sums)

        x, s = chained(x0)
        acc = float(s)  # compile + warmup, host-materialized

        def run(outer):
            nonlocal x, acc
            t0 = time.perf_counter()
            for _ in range(outer):
                x, s = chained(x)
                acc += float(s)
            return time.perf_counter() - t0

        w1 = run(args.outer)
        w2 = run(2 * args.outer)
        assert np.isfinite(acc), label
        ratio = w2 / w1
        if not 1.5 <= ratio <= 2.7:
            print(f"REFUSED {label}: 2x work -> {ratio:.2f}x wall",
                  file=sys.stderr)
            sys.exit(1)
        ms = (w1 + w2) / (3 * args.outer * args.inner) * 1e3
        tops = flops_per_iter / (ms * 1e-3)
        if tops > INT8_PEAK:
            print(f"REFUSED {label}: implied {tops / 1e12:.0f} TOPS "
                  f"exceeds the {INT8_PEAK / 1e12:.0f} TOPS chip peak",
                  file=sys.stderr)
            sys.exit(1)
        return ms, round(ratio, 2), tops

    for sh in args.shapes:
        d = SHAPES[sh]
        B, H, W, cin, cout = (args.batch, d["h"], d["w"], d["cin"],
                              d["cout"])
        flops = 2.0 * B * H * W * 16 * cin * cout
        xq0 = jnp.asarray(rng.randint(-127, 128, (B, H, W, cin))
                          .astype(np.int8))
        wq = jnp.asarray(rng.randint(-127, 128, (4, 4, cout, cin))
                         .astype(np.int8))
        scale = jnp.asarray(
            rng.uniform(1e-4, 2e-4, (cout,)).astype(np.float32))
        wf = jnp.asarray(
            rng.uniform(-0.05, 0.05, (4, 4, cout, cin))
            .astype(np.float32)).astype(jnp.bfloat16)

        def perturb(carry, out):
            # fold the output into the int8 carry so the next
            # dispatch's input bits differ (memoization defense);
            # int8 add wraps, which is fine for timing
            delta = (jnp.sum(out.astype(jnp.float32))
                     .astype(jnp.int32) % 3).astype(jnp.int8)
            return carry + delta, jnp.sum(out.astype(jnp.float32))

        def xla_int8(carry):
            hwio = jnp.flip(wq, axis=(0, 1)).transpose(0, 1, 3, 2)
            acc = lax.conv_general_dilated(
                carry, hwio, window_strides=(1, 1),
                padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            out = (acc.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            return perturb(carry, out)

        def pallas_fn(taps):
            def f(carry):
                out = deconv4x4s2_int8(carry, wq, scale, taps=taps)
                return perturb(carry, out)
            return f

        def bf16_fn(carry):
            hwio = jnp.flip(wf, axis=(0, 1)).transpose(0, 1, 3, 2)
            out = lax.conv_general_dilated(
                carry.astype(jnp.bfloat16) * jnp.bfloat16(0.01), hwio,
                window_strides=(1, 1),
                padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return perturb(carry, out)

        fns = dict(xla_int8=xla_int8,
                   pallas_concat=pallas_fn(False),
                   pallas_taps=pallas_fn(True),
                   bf16=bf16_fn)
        for name in args.variants:
            if name == "dot_probe":
                continue
            if name not in fns:
                raise SystemExit(f"unknown variant {name}")
            ms, lin, tops = timed_chain(fns[name], xq0, flops,
                                        f"{sh}/{name}")
            rows.append(dict(
                shape=sh, variant=name, batch=B,
                hw=[H, W], cin=cin, cout=cout,
                ms_per_iter=round(ms, 3),
                gflops=round(flops / 1e9, 1),
                tflops=round(tops / 1e12, 1),
                int8_mfu=round(tops / INT8_PEAK, 3),
                linearity=lin, inner=args.inner))
            print(json.dumps(rows[-1]))

        if "dot_probe" in args.variants:
            # pure int8 matmul at the polyphase shape; M capped so the
            # operand stays modest in HBM (rate, not capacity, is the
            # question)
            M = min(B * H * W, 131072)
            K, N = 4 * cin, cout
            a0 = jnp.asarray(rng.randint(-127, 128, (M, K))
                             .astype(np.int8))
            bmat = jnp.asarray(rng.randint(-127, 128, (K, N))
                               .astype(np.int8))
            pf = 2.0 * M * K * N

            def probe(carry):
                out = int8_matmul(carry, bmat)
                delta = (jnp.sum(out) % 3).astype(jnp.int8)
                return carry + delta, jnp.sum(out).astype(jnp.float32)

            ms, lin, tops = timed_chain(probe, a0, pf,
                                        f"{sh}/dot_probe")
            rows.append(dict(
                shape=sh, variant="dot_probe", m=M, k=K, n=N,
                ms_per_iter=round(ms, 3),
                gflops=round(pf / 1e9, 1),
                tflops=round(tops / 1e12, 1),
                int8_mfu=round(tops / INT8_PEAK, 3),
                linearity=lin, inner=args.inner))
            print(json.dumps(rows[-1]))

    with open(args.out, "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
