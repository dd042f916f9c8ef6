"""Pallas TPU int8 kernels: the kernel-level attempt at the MXU's
double int8 rate for the quantized deconvs (VERDICT r4 next-3).

Context (BENCH_NOTES_r03.md §2, runs/trace_r03_int8): XLA lowers int8
``conv_general_dilated`` at the bf16 FLOP rate — every quantized conv
in the resnet graph sustains 0.30-0.47 int8-MFU (= 0.6-0.94 bf16-MFU)
— while a plain int8 ``dot_general`` on the same chip reaches 212 TOPS
(1.08x the bf16 peak).  The graph-level rewrite (deconv as stacked-K
dot) was measured SLOWER (9.07 vs 5.98 ms) because the im2col operand
had to be materialized in HBM (536 MB at batch 512).  The kernel-level
version here builds the im2col patches IN VMEM — no HBM
materialization — and feeds int8 ``jnp.dot`` tiles to the MXU.

Target ops — the top-2 int8 convs by time in the r03 trace, both
ConvTranspose(4, 4, stride 2) decoder layers (models/resnet.py
deconv1/deconv2; 5.98 + 1.44 ms of the 32.57 ms int8 iteration):

**Polyphase decomposition.**  A k4/s2/p1 transposed conv splits by
output-pixel parity into FOUR independent 2x2 stride-1 convs over the
(1-padded) input: with torch semantics ``out[2m+a, 2n+c] =
sum_{di,dj} x[m-1+a+di, n-1+c+dj] . W[kr[a][di], kc[c][dj]]`` where
``kr[0]=(3,1), kr[1]=(2,0)`` (derived from the lhs-dilated-conv
spelling in models/quant.py QuantConvTranspose; verified bit-exact
against it in tests/test_pallas_int8.py).  Each phase is an
(H.W, 4.C_in) @ (4.C_in, C_out) int8 matmul — exactly the shape the
212-TOPS probe proved the MXU doubles on.

**Output layout without a shuffle.**  (B, 2H, 2W, C) viewed as
(B, H, 2, W, 2, C) is a zero-copy reshape; phase (a, c) owns the
contiguous-block slice [:, :, a, :, c, :], so each phase's matmul
result writes straight to its final location — no interleave pass, no
post-kernel transpose (the r03 stacked-dot attempt lost partly to
exactly such data movement).

The dequant epilogue (int32 -> f32 * s_in*s_w[oc] -> compute dtype) is
fused into the kernel, so the op consumes int8 activations and emits
the same tensor the XLA int8 path does.

STATUS — measured and REJECTED from the hot path (r05, closing the
int8 question permanently; BENCH_NOTES_r05.md §2 and
benchmarks/pallas_int8_r05.jsonl).  The kernel is bit-exact but ~35%
slower than XLA's conv spelling at every decoder shape, and the
same-process control probes prove no dot-based spelling can ever win:
a PURE int8 matmul at the polyphase shape (M=131072, K=1024, N=256)
runs at 16.8 TOPS in Pallas and 17.1 via XLA dot_general — the MXU's
double int8 rate exists only at large square shapes (125 TOPS at
8192³ same day) and collapses with small N, which conv decompositions
of this decoder inherently produce.  XLA's bf16-rate conv emitter is
the best available spelling; int8's real value stays halved HBM
traffic (BENCH_NOTES_r03.md §2).  The kernel and its exactness tests
remain as the repo's worked int8-Pallas example.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# phase row/col -> source kernel taps (module docstring derivation):
# output row 2m+a reads input rows (m-1+a, m+a) with kernel rows
# KR[a]; columns identically with KC = KR.
_KR = ((3, 1), (2, 0))


def prep_deconv_weights(wq: jax.Array) -> jax.Array:
    """Rearrange an int8 (4, 4, C_out, C_in) transposed-conv kernel
    (the flax ``transpose_kernel=True`` param layout models/quant.py
    quantizes) into the 4 per-phase matmul operands.

    Returns (4, 4*C_in, C_out) int8: phase p = a*2 + c, rows ordered
    (di, dj) row-major to match the kernel's im2col column order.
    """
    assert wq.shape[:2] == (4, 4), wq.shape
    phases = []
    for a in (0, 1):
        for c in (0, 1):
            blocks = [
                wq[_KR[a][di], _KR[c][dj]].T  # (C_in, C_out)
                for di in (0, 1) for dj in (0, 1)
            ]
            phases.append(jnp.concatenate(blocks, axis=0))
    return jnp.stack(phases)


def _deconv_kernel(x_ref, w_ref, scale_ref, o_ref, *, taps: bool):
    """One image per grid step; 4 polyphase int8 matmuls + fused
    dequant.  x_ref: (1, H+2, W+2, C_in) int8 (1-padded); w_ref:
    (4, 4*C_in, C_out) int8; scale_ref: (1, C_out) f32 combined
    s_in*s_w; o_ref: (1, H, 2, W, 2, C_out) compute dtype.

    Two spellings of the same int32-exact math (benchmarked on chip):
    ``taps=False`` concatenates the 2x2 patches into one (H.W, 4C)
    im2col operand and runs one K=4C dot per phase; ``taps=True``
    skips the concat and sums four K=C dots — less VMEM traffic, but
    shorter MXU contractions."""
    H, W = o_ref.shape[1], o_ref.shape[3]
    c_in = x_ref.shape[3]
    c_out = o_ref.shape[5]
    for a in (0, 1):
        for c in (0, 1):
            p = a * 2 + c
            patches = [
                x_ref[0, a + di:a + di + H,
                      c + dj:c + dj + W, :].reshape(H * W, c_in)
                for di in (0, 1) for dj in (0, 1)
            ]
            if taps:
                acc = sum(
                    jnp.dot(patch, w_ref[p, t * c_in:(t + 1) * c_in, :],
                            preferred_element_type=jnp.int32)
                    for t, patch in enumerate(patches))
            else:
                im = jnp.concatenate(patches, axis=-1)  # (H*W, 4C)
                acc = jnp.dot(im, w_ref[p],
                              preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * scale_ref[0]
            o_ref[0, :, a, :, c, :] = y.reshape(
                H, W, c_out).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret", "taps"))
def deconv4x4s2_int8(xq: jax.Array, wq: jax.Array,
                     scale: jax.Array, out_dtype=jnp.bfloat16,
                     interpret: bool = False,
                     taps: bool = False) -> jax.Array:
    """Quantized ConvTranspose(4, 4, stride 2, 'SAME') forward.

    Args:
      xq: (B, H, W, C_in) int8 quantized activations.
      wq: (4, 4, C_out, C_in) int8 quantized kernel (the layout
        models/quant.py ``_quantize_weights(kernel, (0, 1, 3))``
        produces from the flax transpose_kernel param).
      scale: (C_out,) f32 combined dequant scale ``s_in * s_w[oc]``.
      out_dtype: compute dtype of the returned tensor.

    Returns:
      (B, 2H, 2W, C_out) ``out_dtype`` — the same tensor
      models/quant.py's int8 lhs-dilated conv path produces.
    """
    B, H, W, c_in = xq.shape
    c_out = wq.shape[2]
    # zero int8 padding is exact: symmetric quantization maps 0 -> 0
    x_pad = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w_ph = prep_deconv_weights(wq)
    scale2 = scale.reshape(1, c_out).astype(jnp.float32)

    out6 = pl.pallas_call(
        functools.partial(_deconv_kernel, taps=taps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, c_in),
                         lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * c_in, c_out), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, 2, W, 2, c_out),
                               lambda b: (b, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, 2, W, 2, c_out),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 16 * c_in * c_out,
            bytes_accessed=(B * (H + 2) * (W + 2) * c_in
                            + 4 * 4 * c_in * c_out
                            + B * 4 * H * W * c_out
                            * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x_pad, w_ph, scale2)
    return out6.reshape(B, 2 * H, 2 * W, c_out)


# ------------------------------------------------------------------
# int8 matmul probe kernel: measures the achievable MXU int8 rate at
# the polyphase shapes (M = B*H*W, K = 4*C_in, N = C_out) without any
# conv machinery — the decisive number for whether the kernel above
# can beat XLA's bf16-rate conv lowering.
# ------------------------------------------------------------------

def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def int8_matmul(a: jax.Array, b: jax.Array, tile_m: int = 1024,
                interpret: bool = False) -> jax.Array:
    """(M, K) int8 @ (K, N) int8 -> (M, N) int32, tiled over M only
    (K and N stay whole — the polyphase shapes have K <= 4096,
    N <= 512, which fit VMEM alongside an M tile)."""
    M, K = a.shape
    N = b.shape[1]
    assert M % tile_m == 0, (M, tile_m)
    return pl.pallas_call(
        _mm_kernel,
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K + K * N + M * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(a, b)
