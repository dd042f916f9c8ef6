"""Post-training int8 quantization for the inference path.

Beyond-reference capability (the reference runs fp32 CUDA only).
What int8 buys HERE — measured, not the datasheet pitch: the v5e MXU
lists 2x int8 throughput (394 TOPS vs 197 TFLOPS bf16), but XLA's TPU
*convolution* lowering never engages the double-rate path — every
quantized conv in this graph sustains the bf16 FLOP rate (0.30-0.47
int8-MFU == 0.6-0.94 bf16-MFU, runs/trace_r03_int8), while a plain
int8 ``dot_general`` on the same chip reaches 212 TOPS (1.08x the
bf16 peak, benchmarks/int8_probe_r03.jsonl).  Re-spelling the big
deconv as stacked-K dot_generals was tried and measured SLOWER than
the conv spelling (9.07 ms vs 5.98 ms — the stacked input copy and
K=1024 matmul rate eat the win; same probe file).  Round 5 closed the
question at the KERNEL level too: a Pallas polyphase im2col-in-VMEM
int8 deconv (ops/pallas_int8.py) is bit-exact but ~35% slower, and
same-day control probes showed the int8 dot rate itself collapses to
~17 TOPS at the skinny (M, 1024, 256) shapes conv decompositions
produce — no user-level spelling can reach the double-rate path
(BENCH_NOTES_r05.md §2).  So on current
XLA, int8's real value for conv nets is halved HBM traffic: +26%
end-to-end at batch 512 (15,721 fps vs 12,492 bf16), not 2x.  Full
analysis: BENCH_NOTES_r03.md.  Scheme:

- **Weights**: symmetric per-output-channel int8, scales derived from
  the fp32 params at trace time (no separate weight checkpoint — the
  rounding is part of the compiled graph, so XLA constant-folds it
  when params are donated/frozen buffers).
- **Activations**: symmetric per-tensor int8 with a static scale
  recorded by a calibration pass (running max of |x| over calibration
  batches, stored in a ``quant`` flax collection).
- **Math**: ``conv(int8, int8) -> int32`` on the MXU, dequantized with
  ``s_in * s_w[oc]`` back to the compute dtype; BatchNorm / ReLU /
  residual adds stay in the compute dtype.

The modules below keep the SAME param-tree layout as ``nn.Conv`` /
``nn.ConvTranspose`` (a ``kernel`` param under the same module name),
so any trained or torch-imported checkpoint loads into the quantized
model unchanged; only the ``quant`` collection is new.

Modes (``quant_mode`` on the backbone):
- ``"off"``    — plain fp/bf16 conv; no quant variables exist.
- ``"calib"``  — fp forward that records per-layer max|activation| into
  the mutable ``quant`` collection (``mutable=["quant"]``); the
  ``calib_percentile`` attribute (default 100 == running max) records a
  per-batch |x| percentile instead, clipping activation outliers that
  otherwise coarsen the int8 grid (deep bottleneck nets need this —
  see BENCH_NOTES int8 accuracy table).
- ``"int8"``   — quantized forward using the calibrated scales.
- ``"int8_w"`` — weights-only int8 (per-channel rounding, fp
  activations): isolates weight-rounding error from activation
  clipping when debugging an accuracy regression.
- ``"qat"``    — quantization-aware-training forward: numerically the
  ``int8`` forward (fake-quantized weights and activations) with
  straight-through-estimator gradients, so a short fine-tune adapts
  the weights to the int8 grid and recovers the post-training-quant
  accuracy loss.  Activation scales stay FROZEN at their calibrated
  values (freeze-observer QAT; a zero scale falls back to the batch
  max).  Driver: ``awr_tpu.training.qat.finetune``.

Usage: see :func:`calibrate` and tests/test_quant.py.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

QUANT_COL = "quant"
_QMAX = 127.0


def _quantize_weights(kernel: jax.Array, axes: Tuple[int, ...]):
    """Symmetric per-output-channel int8: returns (int8 kernel, scales).

    ``axes`` are the kernel axes to reduce over (everything except the
    output-channel axis).
    """
    k32 = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=axes, keepdims=True)
    scale = jnp.maximum(amax / _QMAX, 1e-12)
    q = jnp.clip(jnp.round(k32 / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


# Calibration amplitude statistic: 100.0 records the running max|x|;
# < 100 records a per-batch |x| percentile (outlier clipping).  Set by
# :func:`calibrate` BEFORE the calib model traces (a one-off host pass,
# so a module global is safe — it is baked into the traced graph).
_CALIB_PERCENTILE = 100.0


def _calib_amax(x: jax.Array) -> jax.Array:
    """|x| amplitude for calibration: max, or a percentile (outlier
    clipping — a handful of extreme activations otherwise stretches the
    int8 grid until the bulk of the distribution rounds to a few
    codes)."""
    ax = jnp.abs(x.astype(jnp.float32))
    if _CALIB_PERCENTILE >= 100.0:
        return jnp.max(ax)
    return jnp.percentile(ax.reshape(-1), _CALIB_PERCENTILE)


def _quantize_acts(x: jax.Array, scale: jax.Array):
    """Symmetric per-tensor int8 with a precomputed (calibrated) scale."""
    s = jnp.maximum(scale, 1e-12).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -_QMAX, _QMAX)
    return q.astype(jnp.int8), s


def _ste(x: jax.Array, x_fq: jax.Array) -> jax.Array:
    """Straight-through estimator: forward value ``x_fq`` (the
    fake-quantized tensor), gradient d/dx = 1 (the rounding step has
    zero gradient a.e., so QAT passes gradients straight through)."""
    x32 = x.astype(jnp.float32)
    return x32 + jax.lax.stop_gradient(x_fq.astype(jnp.float32) - x32)


def _qat_act_scale(x: jax.Array, stored: jax.Array) -> jax.Array:
    """QAT activation scale: the frozen calibrated value, or the batch
    max for an uncalibrated (zero) scale — dynamic-quant fallback."""
    s_batch = jnp.max(jnp.abs(x.astype(jnp.float32))) / _QMAX
    return jnp.where(stored > 0, stored, s_batch)


class QuantConv(nn.Module):
    """``nn.Conv``-compatible conv with optional int8 quantization.

    Param tree: ``{kernel[, bias]}`` exactly like ``nn.Conv`` with the
    same name, so checkpoints are interchangeable across modes.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.float32
    mode: str = "off"  # 'off' | 'calib' | 'int8' | 'int8_w'

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kshape = (kh, kw, x.shape[-1], self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)

        if self.mode == "off":
            y = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif self.mode == "int8_w":
            wq, s_w = _quantize_weights(kernel, (0, 1, 2))
            wdq = (wq.astype(jnp.float32) * s_w).astype(self.dtype)
            y = lax.conv_general_dilated(
                x.astype(self.dtype), wdq,
                self.strides, self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            act_scale = self.variable(
                QUANT_COL, "act_scale",
                lambda: jnp.zeros((), jnp.float32))
            if self.mode == "calib":
                if not self.is_initializing():
                    act_scale.value = jnp.maximum(
                        act_scale.value,
                        _calib_amax(x) / _QMAX)
                y = lax.conv_general_dilated(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    self.strides, self.padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            elif self.mode == "int8":
                xq, s_in = _quantize_acts(x, act_scale.value)
                wq, s_w = _quantize_weights(kernel, (0, 1, 2))
                acc = lax.conv_general_dilated(
                    xq, wq, self.strides, self.padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32)
                     * (s_in * s_w[0, 0, 0, :])).astype(self.dtype)
            elif self.mode == "qat":
                # Fake-quant QAT forward: conv(xq·s_in, wq·s_w) equals
                # the int8 path's conv(xq, wq)·s_in·s_w in real
                # arithmetic, so the loss being optimized IS the int8
                # serving loss; STE lets gradients adapt the fp weights
                # to the int8 grid.  Scales are frozen (module
                # docstring: freeze-observer QAT).  The conv runs in
                # fp32 at HIGHEST precision regardless of the global
                # matmul setting: at the default (bf16-class) precision
                # the scaled operands would truncate to bf16 and the
                # QAT objective would drift from the exact-int32 int8
                # path it stands in for.
                s = _qat_act_scale(x, act_scale.value)
                xq, s_in = _quantize_acts(x, s)
                x_fq = _ste(x, xq.astype(jnp.float32) * s_in)
                wq, s_w = _quantize_weights(kernel, (0, 1, 2))
                w_fq = _ste(kernel, wq.astype(jnp.float32) * s_w)
                y = lax.conv_general_dilated(
                    x_fq, w_fq,
                    self.strides, self.padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=lax.Precision.HIGHEST,
                ).astype(self.dtype)
            else:
                raise ValueError(f"unknown quant mode {self.mode!r}")

        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class QuantConvTranspose(nn.Module):
    """``nn.ConvTranspose(transpose_kernel=True)``-compatible deconv.

    Mirrors the reference decoder's torch ``ConvTranspose2d(k4, s2,
    p1)`` (reference resnet_deconv.py:73-91) exactly like
    ``models/resnet.py`` does, with the torch (in, out) kernel layout
    preserved in the params (``transpose_kernel=True`` semantics:
    kernel shape (kh, kw, OUT, IN), spatially flipped lhs-dilated
    conv).  Output-channel axis for weight scales is axis 2.
    """

    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32
    mode: str = "off"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        # flax ConvTranspose(transpose_kernel=True) params: (kh,kw,out,in)
        kshape = (kh, kw, self.features, x.shape[-1])
        kernel = self.param("kernel", self.kernel_init, kshape)

        def deconv(lhs, kern, prefer=None, precision=None):
            # 'SAME' padding of flax ConvTranspose at k4/s2 == torch
            # ConvTranspose2d(k4, s2, p1): lhs-dilated conv with the
            # spatially-flipped kernel, pad (k-1-p)=2 then trim per
            # SAME sizing (out = in*stride exactly for k4/s2/p1).
            flipped = jnp.flip(kern, axis=(0, 1))  # (kh,kw,out,in)
            hwio = flipped.transpose(0, 1, 3, 2)   # (kh,kw,in,out)
            return lax.conv_general_dilated(
                lhs, hwio, window_strides=(1, 1),
                padding=((kh - 2, kh - 2), (kw - 2, kw - 2)),
                lhs_dilation=self.strides,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=prefer,
                precision=precision)

        if self.mode == "off":
            return deconv(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.mode == "int8_w":
            wq, s_w = _quantize_weights(kernel, (0, 1, 3))
            wdq = (wq.astype(jnp.float32) * s_w).astype(self.dtype)
            return deconv(x.astype(self.dtype), wdq)

        act_scale = self.variable(
            QUANT_COL, "act_scale", lambda: jnp.zeros((), jnp.float32))
        if self.mode == "calib":
            if not self.is_initializing():
                act_scale.value = jnp.maximum(
                    act_scale.value,
                    _calib_amax(x) / _QMAX)
            return deconv(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.mode == "int8":
            xq, s_in = _quantize_acts(x, act_scale.value)
            wq, s_w = _quantize_weights(kernel, (0, 1, 3))  # out axis = 2
            acc = deconv(xq, wq, prefer=jnp.int32)
            return (acc.astype(jnp.float32)
                    * (s_in * s_w[0, 0, :, 0])).astype(self.dtype)
        if self.mode == "qat":
            # fake-quant + STE; frozen scales; explicit HIGHEST conv
            # precision (see QuantConv 'qat' for why)
            s = _qat_act_scale(x, act_scale.value)
            xq, s_in = _quantize_acts(x, s)
            x_fq = _ste(x, xq.astype(jnp.float32) * s_in)
            wq, s_w = _quantize_weights(kernel, (0, 1, 3))
            w_fq = _ste(kernel, wq.astype(jnp.float32) * s_w)
            return deconv(x_fq, w_fq,
                          precision=lax.Precision.HIGHEST
                          ).astype(self.dtype)
        raise ValueError(f"unknown quant mode {self.mode!r}")


def calibrate(model, params, batch_stats, batches: Sequence[jax.Array],
              train: bool = False, percentile: float = 100.0):
    """Run calibration batches through a ``quant_mode='calib'`` model.

    ``batches``: iterable of (B, H, W) normalized depth images (same
    input convention as the backbone, pre-``[..., None]``).  Returns
    the calibrated ``quant`` collection (per-layer activation scales =
    running max-over-batches of the |x| amplitude / 127, where the
    amplitude is the batch max or, with ``percentile < 100``, that
    |x| percentile — clipping activation outliers, which deep
    bottleneck nets need; see BENCH_NOTES).
    """
    global _CALIB_PERCENTILE
    _CALIB_PERCENTILE = float(percentile)
    # abstract init: materialize the zeroed quant collection without
    # compiling (a real model.init would cost a full remote TPU compile
    # whose output — all-zero scalar scales — is discarded)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + batches[0].shape[1:] + (1,)),
                           train=False))[QUANT_COL]
    quant = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def step(quant, img):
        _, mut = model.apply(
            {"params": params, "batch_stats": batch_stats,
             QUANT_COL: quant},
            img[..., None], train=train, mutable=[QUANT_COL])
        return mut[QUANT_COL]

    for img in batches:
        quant = step(quant, jnp.asarray(img))
    return quant
