"""Shared model building blocks and torch-compatible initializers.

All convs use explicit torch-style symmetric padding (never 'SAME') so
strided layers sample the same spatial positions as the reference — a
requirement for bit-parity under torch weight import.
"""

from __future__ import annotations

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


def batch_norm(train: bool, dtype=jnp.float32, name=None):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
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
    """torch nn.Upsample(scale_factor=2, mode='nearest') on NHWC."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
