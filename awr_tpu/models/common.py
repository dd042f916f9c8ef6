"""Shared model building blocks and torch-compatible initializers.

All convs use explicit torch-style symmetric padding (never 'SAME') so
strided layers sample the same spatial positions as the reference — a
requirement for bit-parity under torch weight import.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import random

# torch BatchNorm2d(momentum=0.1) == flax BatchNorm(momentum=0.9):
# flax's momentum is the EMA *decay*, torch's is (1 - decay).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def he_fanout_normal():
    """N(0, sqrt(2/n)) with n = kh*kw*out_channels.

    The reference inits every encoder conv this way
    (reference resnet_deconv.py:93-97); note fan-OUT, not fan-in.
    flax kernels are (kh, kw, in, out).
    """

    def init(key, shape, dtype=jnp.float32):
        n = shape[0] * shape[1] * shape[3]
        return random.normal(key, shape, dtype) * np.sqrt(2.0 / n)

    return init


def normal_001():
    """N(0, 0.001): deconvs and prediction heads (resnet_deconv.py:103-115)."""
    return nn.initializers.normal(stddev=0.001)


def torch_conv_kernel_init():
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) ==
    U(-sqrt(1/fan_in), sqrt(1/fan_in)) with fan_in = kh*kw*in."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        bound = np.sqrt(1.0 / fan_in)
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_bias_init(kernel_shape):
    """torch Conv2d default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = kernel_shape[0] * kernel_shape[1] * kernel_shape[2]
    bound = np.sqrt(1.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvParams(nn.Module):
    """Declares a conv's kernel/bias with ``nn.Conv``'s exact param
    names, shapes, and inits — WITHOUT running the conv.

    Used to fuse sibling output-head convs that read the same input
    (hourglass ``out_vec{i}``/``out_ht{i}``, resnet ``final1``/
    ``final2``): the caller concatenates the kernels on the
    output-channel axis and runs ONE ``conv_general_dilated``, so the
    (B,F,F,256) feature map is read once instead of per-branch and the
    output concat disappears (~2 GB/iter on the batch-512 hourglass
    trace, BENCH_NOTES_r05.md §5).  Because flax derives param RNG
    from the module path and this module declares the same
    ``<name>/{kernel,bias}`` leaves ``nn.Conv`` would, init draws,
    torch weight import, and Orbax checkpoints are all byte-identical
    to the unfused spelling."""

    features: int
    in_features: int
    kernel: int = 1
    use_bias: bool = True
    kernel_init: Any = None  # default: torch Conv2d kaiming-uniform
    bias_init: Any = None    # default: torch Conv2d bias uniform

    @nn.compact
    def __call__(self):
        kshape = (self.kernel, self.kernel, self.in_features,
                  self.features)
        kinit = self.kernel_init or torch_conv_kernel_init()
        binit = self.bias_init or torch_conv_bias_init(kshape)
        k = self.param("kernel", kinit, kshape, jnp.float32)
        if not self.use_bias:
            return k, None
        b = self.param("bias", binit, (self.features,), jnp.float32)
        return k, b


class TorchConv(nn.Module):
    """Conv with torch-default init and explicit symmetric padding.

    ``quant_mode`` != 'off' swaps in :class:`awr_tpu.models.quant.
    QuantConv` under the SAME param path ('Conv_0', identical
    kernel/bias layout), so fp and int8 checkpoints stay
    interchangeable (see models/quant.py)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        kshape = (self.kernel, self.kernel, x.shape[-1], self.features)
        if self.quant_mode != "off":
            from awr_tpu.models.quant import QuantConv

            return QuantConv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=self.use_bias,
                kernel_init=torch_conv_kernel_init(),
                bias_init=torch_conv_bias_init(kshape),
                dtype=self.dtype,
                mode=self.quant_mode,
                name="Conv_0",
            )(x)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(kshape),
            dtype=self.dtype,
        )(x)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's running-stat semantics.

    flax's ``nn.BatchNorm`` feeds the *biased* batch variance into the
    running-var EMA; torch ``BatchNorm2d`` normalizes with the biased
    variance but updates ``running_var`` with the *unbiased* one
    (Bessel factor n/(n-1) over n = N*H*W).  The reference trains with
    torch BN (resnet_deconv.py:6 ``BN_MOMENTUM=0.1``), so eval-mode
    parity after K identical train steps requires the torch update rule
    (asserted by tests/test_train_dynamics_oracle.py).

    Param/stat names match flax's ('scale'/'bias', 'mean'/'var') so
    checkpoints and the torch weight importer are unaffected.
    """

    use_running_average: bool
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        # stats in at-least-fp32 (fp32 under bf16 compute, fp64 under
        # the x64 train-dynamics oracle)
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        if self.use_running_average:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            axes = tuple(range(x.ndim - 1))
            xs = x.astype(stat_dtype)
            mean = jnp.mean(xs, axis=axes)
            # biased variance normalizes the activations (torch + flax);
            # two-pass form: E[x^2]-E[x]^2 loses ~3 digits to
            # cancellation and shows up in the train-dynamics oracle
            var = jnp.mean(jnp.square(xs - mean), axis=axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                bessel = n / max(n - 1, 1)
                keep = lambda s, v: (self.momentum * s
                                     + (1.0 - self.momentum) * v)
                ra_mean.value = keep(ra_mean.value,
                                     mean.astype(ra_mean.value.dtype))
                ra_var.value = keep(
                    ra_var.value,
                    (var * bessel).astype(ra_var.value.dtype))
        y = (x.astype(stat_dtype) - mean) * jax.lax.rsqrt(
            var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def batch_norm(train: bool, dtype=jnp.float32, name=None):
    return TorchBatchNorm(
        use_running_average=not train,
        dtype=dtype,
        name=name,
    )


def max_pool_torch(x, kernel: int, stride: int, padding: int):
    """torch MaxPool2d(kernel, stride, padding) on NHWC."""
    return nn.max_pool(
        x,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def upsample_nearest_2x(x):
    """torch nn.Upsample(scale_factor=2, mode='nearest') on NHWC.

    Spelled as ONE broadcast_in_dim to (N,H,2,W,2,C) + reshape rather
    than two sequential ``jnp.repeat`` calls: repeat-per-axis lowers to
    two materialized HBM broadcasts with the (N,2H,W,C) intermediate
    written and re-read (~3.6 GB/iter of broadcast traffic in the
    batch-512 hourglass trace, runs/trace_r04_hg).  The single-op
    spelling halves the upsample's HBM traffic on this bandwidth-bound
    family and fuses better with the consumer skip-add.  Numerically
    identical (pure data movement).
    """
    n, h, w, c = x.shape
    y = jax.lax.broadcast_in_dim(x, (n, h, 2, w, 2, c), (0, 1, 3, 5))
    return y.reshape(n, 2 * h, 2 * w, c)
