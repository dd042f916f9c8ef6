"""Does int8 EVER hit its 2x MXU rate on this chip, for any op shape?

The r3 int8 per-op trace (runs/trace_r03_int8, BENCH_NOTES_r03.md)
shows every quantized *convolution* in the ResNet18 graph sustaining
0.30-0.47 int8-MFU == the bf16 FLOP rate: the int8 double-rate never
engages in conv lowering.  This probe isolates the question from the
model: time square bf16 matmuls vs int8 x int8 -> int32 matmuls, and a
k3s1 NHWC conv in both dtypes, at MXU-saturating shapes.

If the pure dot_general shows ~2x, the conv gap is an XLA conv-lowering
limitation (a restructure-to-matmul fix could work); if the dot_general
is ALSO ~1x, the 394-TOPS pitch is unreachable from XLA today and the
documented ceiling is structural for the whole framework.

Methodology per BENCH_METHODOLOGY.md: os.urandom-salted inputs, serial
lax.scan chains (each step consumes the previous result), 2x-work
linearity gate, host-materialized checksum.

Usage: python benchmarks/int8_matmul_probe.py [--size 4096] [--inner 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BF16_PEAK_TFLOPS = 197.0   # v5e datasheet
INT8_PEAK_TOPS = 394.0


def _salt() -> float:
    return int.from_bytes(os.urandom(4), "little") / 2**32


def _chain_matmul(dtype_name: str, n: int, inner: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(17)
    a_f = rng.uniform(-1, 1, (n, n)).astype(np.float32) + _salt() * 1e-3
    b_f = rng.uniform(-1, 1, (n, n)).astype(np.float32) + _salt() * 1e-3

    if dtype_name == "int8":
        a = jnp.asarray((a_f * 100).astype(np.int8))
        b = jnp.asarray((b_f * 100).astype(np.int8))

        @jax.jit
        def chained(a):
            def body(carry, _):
                acc = jax.lax.dot_general(
                    carry, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                # feed the result back at int8 so every step depends on
                # the last (no cross-step parallelism / memoization)
                nxt = (acc >> 12).astype(jnp.int8)
                return nxt, jnp.sum(acc[0, :64])
            out, sums = jax.lax.scan(body, a, None, length=inner)
            return out, jnp.sum(sums)
    else:
        a = jnp.asarray(a_f, jnp.bfloat16)
        b = jnp.asarray(b_f, jnp.bfloat16)

        @jax.jit
        def chained(a):
            def body(carry, _):
                # bf16 out: accumulation is f32 inside the MXU either
                # way; a f32 result would double the write traffic and
                # force a separate downcast pass
                acc = jax.lax.dot_general(
                    carry, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16)
                nxt = acc * jnp.bfloat16(1e-3)
                return nxt, jnp.sum(acc[0, :64].astype(jnp.float32))
            out, sums = jax.lax.scan(body, a, None, length=inner)
            return out, jnp.sum(sums)

    return a, chained


def _chain_conv(dtype_name: str, batch: int, hw: int, ch: int,
                inner: int):
    """k3s1 NHWC conv at an MXU-friendly channel count (ch >= 128)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.RandomState(29)
    x_f = (rng.uniform(-1, 1, (batch, hw, hw, ch)).astype(np.float32)
           + _salt() * 1e-3)
    k_f = rng.uniform(-1, 1, (3, 3, ch, ch)).astype(np.float32)

    def conv(lhs, kern, prefer):
        return lax.conv_general_dilated(
            lhs, kern, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=prefer)

    if dtype_name == "int8":
        x = jnp.asarray((x_f * 100).astype(np.int8))
        k = jnp.asarray((k_f * 100).astype(np.int8))

        @jax.jit
        def chained(x):
            def body(carry, _):
                acc = conv(carry, k, jnp.int32)
                nxt = (acc >> 14).astype(jnp.int8)
                return nxt, jnp.sum(acc, dtype=jnp.int32)
            out, sums = jax.lax.scan(body, x, None, length=inner)
            return out, jnp.sum(sums)
    else:
        x = jnp.asarray(x_f, jnp.bfloat16)
        k = jnp.asarray(k_f, jnp.bfloat16)

        @jax.jit
        def chained(x):
            def body(carry, _):
                acc = conv(carry, k, jnp.float32)
                nxt = (acc * 1e-4).astype(jnp.bfloat16)
                return nxt, jnp.sum(acc)
            out, sums = jax.lax.scan(body, x, None, length=inner)
            return out, jnp.sum(sums)

    return x, chained


def _chain_deconv_as_dot(dtype_name: str, batch: int, hw: int, ch: int,
                         inner: int):
    """The ResNet decoder's k4s2p1 ConvTranspose re-spelled as four
    shifted dot_generals (the only int8 path XLA runs at double rate).

    Sub-pixel identity: out[2y+a, 2x+b] = sum_{dy,dx in 2x2}
    x[y-dy', x-dx'] @ W[a,b,dy,dx]; the four taps share shifted copies
    of x, so the op is four (B*hw*hw, ch) @ (ch, 4*ch) matmuls summed
    into a (B, hw, hw, 4*ch) accumulator, then depth-to-space.  FLOPs
    equal the useful deconv FLOPs (2 * B*hw^2 * ch * 4ch * ... same
    1069 GF at B=512, hw=32, ch=256 as fusion.237 in the r3 trace)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(31)
    x_f = (rng.uniform(-1, 1, (batch, hw, hw, ch)).astype(np.float32)
           + _salt() * 1e-3)
    w_f = rng.uniform(-1, 1, (4, ch, 4 * ch)).astype(np.float32)

    taps = ((0, 0), (0, 1), (1, 0), (1, 1))

    if dtype_name == "int8":
        x = jnp.asarray((x_f * 100).astype(np.int8))
        w = jnp.asarray(
            (w_f * 100).astype(np.int8).reshape(4 * ch, 4 * ch))

        @jax.jit
        def chained(x):
            def body(carry, _):
                # taps stacked on K -> ONE (M, 4ch) @ (4ch, 4ch) dot;
                # the dequant epilogue fuses into the matmul, so the
                # only extra HBM vs the conv spelling is the stacked
                # int8 input copy
                sh = jnp.concatenate(
                    [jnp.roll(carry, t, axis=(1, 2)) for t in taps],
                    axis=-1)
                acc = jax.lax.dot_general(
                    sh, w, (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = (acc.astype(jnp.float32)
                       * jnp.float32(1e-4)).astype(jnp.bfloat16)
                nxt = jnp.clip(out[..., :ch] * 100, -127,
                               127).astype(jnp.int8)
                return nxt, jnp.sum(
                    out[0, 0, 0, :64].astype(jnp.float32))
            out, sums = jax.lax.scan(body, x, None, length=inner)
            return out, jnp.sum(sums)
    else:
        x = jnp.asarray(x_f, jnp.bfloat16)
        w = jnp.asarray(w_f.reshape(4 * ch, 4 * ch), jnp.bfloat16)

        @jax.jit
        def chained(x):
            def body(carry, _):
                sh = jnp.concatenate(
                    [jnp.roll(carry, t, axis=(1, 2)) for t in taps],
                    axis=-1)
                acc = jax.lax.dot_general(
                    sh, w, (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16)
                nxt = acc[..., :ch] * jnp.bfloat16(1e-3)
                return nxt, jnp.sum(
                    acc[0, 0, 0, :64].astype(jnp.float32))
            out, sums = jax.lax.scan(body, x, None, length=inner)
            return out, jnp.sum(sums)

    return x, chained


def _time(chained, x0, inner: int, outer: int):
    import numpy as np

    def run(k, x):
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(k):
            x, chk = chained(x)
            s += float(np.asarray(chk, dtype=np.float64))  # host sync
        return time.perf_counter() - t0, x, s
    chained(x0)[1].block_until_ready()  # compile
    dt1, x, _ = run(outer, x0)
    dt2, x, _ = run(2 * outer, x0)
    per = (dt1 + dt2) / (3 * outer * inner)
    ratio = dt2 / dt1
    return per, ratio


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--outer", type=int, default=4)
    ap.add_argument("--conv-batch", type=int, default=64)
    ap.add_argument("--conv-hw", type=int, default=32)
    ap.add_argument("--conv-ch", type=int, default=256)
    ap.add_argument("--only", default="",
                    help="comma list of ops to run (matmul, conv3x3, "
                         "deconv_as_dot); empty = all")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    n = args.size
    mm_flops = 2.0 * n * n * n
    for dt in ("bfloat16", "int8") if (
            only is None or "matmul" in only) else ():
        x0, fn = _chain_matmul(dt, n, args.inner)
        per, ratio = _time(fn, x0, args.inner, args.outer)
        peak = INT8_PEAK_TOPS if dt == "int8" else BF16_PEAK_TFLOPS
        tops = mm_flops / per / 1e12
        print(json.dumps(dict(
            op="matmul", dtype=dt, n=n, ms=round(per * 1e3, 3),
            sustained_tops=round(tops, 1), linearity=round(ratio, 2),
            frac_of_dtype_peak=round(tops / peak, 3),
            frac_of_bf16_peak=round(tops / BF16_PEAK_TFLOPS, 3))))

    b, hw, ch = args.conv_batch, args.conv_hw, args.conv_ch
    cv_flops = 2.0 * b * hw * hw * ch * ch * 9
    for dt in ("bfloat16", "int8") if (
            only is None or "conv3x3" in only) else ():
        x0, fn = _chain_conv(dt, b, hw, ch, args.inner)
        per, ratio = _time(fn, x0, args.inner, args.outer)
        peak = INT8_PEAK_TOPS if dt == "int8" else BF16_PEAK_TFLOPS
        tops = cv_flops / per / 1e12
        print(json.dumps(dict(
            op="conv3x3", dtype=dt, batch=b, hw=hw, ch=ch,
            ms=round(per * 1e3, 3), sustained_tops=round(tops, 1),
            linearity=round(ratio, 2),
            frac_of_dtype_peak=round(tops / peak, 3),
            frac_of_bf16_peak=round(tops / BF16_PEAK_TFLOPS, 3))))

    # the deconv fix attempt: fusion.237's shape (512, 32, 32, 256)
    dc_b, dc_hw, dc_ch = 512, 32, 32 * 8
    dd_flops = 2.0 * dc_b * dc_hw * dc_hw * dc_ch * 4 * dc_ch * 4
    for dt in ("bfloat16", "int8") if (
            only is None or "deconv_as_dot" in only) else ():
        x0, fn = _chain_deconv_as_dot(dt, dc_b, dc_hw, dc_ch,
                                      args.inner)
        per, ratio = _time(fn, x0, args.inner, args.outer)
        peak = INT8_PEAK_TOPS if dt == "int8" else BF16_PEAK_TFLOPS
        tops = dd_flops / per / 1e12
        print(json.dumps(dict(
            op="deconv_as_dot", dtype=dt, batch=dc_b, hw=dc_hw,
            ch=dc_ch, ms=round(per * 1e3, 3),
            sustained_tops=round(tops, 1), linearity=round(ratio, 2),
            frac_of_dtype_peak=round(tops / peak, 3),
            frac_of_bf16_peak=round(tops / BF16_PEAK_TFLOPS, 3))))


if __name__ == "__main__":
    main()
