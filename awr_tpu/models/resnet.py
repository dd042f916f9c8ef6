"""ResNet encoder + deconv decoder emitting dense 4J-channel AWR maps.

Reference parity: model/resnet_deconv.py — depth-1-channel ResNet
{18: (Basic, [2,2,2,2]), 50/101/152: (Bottleneck, ...)} (ref :9-13), 5x5
stride-1 stem + 3x3 stride-2 maxpool (ref :31-36), stage strides
(1,2,2,2) to /32, then ``4 - log2(downsample)`` ConvTranspose(k4 s2 p1,
256ch, no bias)+BN+ReLU decoder (ref :45-49,73-91), and two 1x1 heads
(3J offset vectors, J heatmaps) concatenated to 4J channels (ref :52-53,
133-136).  Init distributions per ref :93-115 (He fan-out for encoder
convs, N(0, .001) for deconvs and heads).

TPU-first: NHWC layout, explicit torch-style padding (so strided convs
sample identical positions — required for torch weight import parity),
bf16-able compute dtype with fp32 params/BN.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from awr_tpu.models.common import (
    batch_norm,
    he_fanout_normal,
    max_pool_torch,
    normal_001,
)

# depth -> (block kind, per-stage block counts) (reference resnet_deconv.py:9-13)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32,
          quant_mode="off"):
    pad = (kernel - 1) // 2
    if quant_mode != "off":
        from awr_tpu.models.quant import QuantConv

        return QuantConv(
            features,
            (kernel, kernel),
            strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            kernel_init=he_fanout_normal(),
            dtype=dtype,
            mode=quant_mode,
            name=name,
        )
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        kernel_init=he_fanout_normal(),
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (reference resnet_deconv.py:145-174)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    quant_mode: str = "off"
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv(self.planes, 3, self.stride, "conv1", self.dtype,
                    self.quant_mode)(x)
        out = batch_norm(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, "conv2", self.dtype,
                    self.quant_mode)(out)
        out = batch_norm(train, self.dtype, "bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            residual = _conv(
                self.planes * self.expansion, 1, self.stride,
                "downsample_conv", self.dtype, self.quant_mode,
            )(x)
            residual = batch_norm(train, self.dtype, "downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) residual block (reference resnet_deconv.py:177-215)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    quant_mode: str = "off"
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv(self.planes, 1, 1, "conv1", self.dtype,
                    self.quant_mode)(x)
        out = batch_norm(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, "conv2", self.dtype,
                    self.quant_mode)(out)
        out = batch_norm(train, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, "conv3",
                    self.dtype, self.quant_mode)(out)
        out = batch_norm(train, self.dtype, "bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            residual = _conv(
                self.planes * self.expansion, 1, self.stride,
                "downsample_conv", self.dtype, self.quant_mode,
            )(x)
            residual = batch_norm(train, self.dtype, "downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetDeconv(nn.Module):
    """Full backbone: (B, H, W, 1) depth -> (B, H/ds, W/ds, 4J) dense map."""

    joint_num: int = 14
    block: str = "basic"  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (2, 2, 2, 2)
    downsample: int = 2  # output stride in {1, 2, 4}
    dtype: jnp.dtype = jnp.float32
    # Post-training int8 inference (models/quant.py): 'off' | 'calib' |
    # 'int8'.  Param tree is identical across modes; the 1x1 heads stay
    # in the compute dtype (they feed the mm-precision decode directly).
    quant_mode: str = "off"
    # Rematerialize each residual block in the backward pass
    # (jax.checkpoint via nn.remat): inner activations are recomputed
    # instead of stored.  Same params/outputs; lower peak HBM.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.downsample in (1, 2, 4), self.downsample
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        if self.remat:
            # `train` (argnum 2 counting self) is a static bool
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        x = x.astype(self.dtype)

        # Stem (reference :31-36): conv5 s1 + BN + ReLU + maxpool3 s2 p1.
        x = _conv(64, 5, 1, "pre_conv", self.dtype, self.quant_mode)(x)
        x = batch_norm(train, self.dtype, "pre_bn")(x)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)

        # Stages at strides (1, 2, 2, 2) (reference :39-43).
        for stage, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2)), start=1
        ):
            for i in range(blocks):
                x = block_cls(
                    planes,
                    stride if i == 0 else 1,
                    self.dtype,
                    self.quant_mode,
                    name=f"layer{stage}_{i}",
                )(x, train)

        # Deconv decoder (reference :45-49, 73-91): /32 back up to /downsample.
        deconv_num = 4 - int(np.log2(self.downsample))
        for i in range(deconv_num):
            if self.quant_mode != "off":
                from awr_tpu.models.quant import QuantConvTranspose

                x = QuantConvTranspose(
                    256,
                    (4, 4),
                    strides=(2, 2),
                    kernel_init=normal_001(),
                    dtype=self.dtype,
                    mode=self.quant_mode,
                    name=f"deconv{i}",
                )(x)
            else:
                x = nn.ConvTranspose(
                    256,
                    (4, 4),
                    strides=(2, 2),
                    padding="SAME",  # == torch ConvTranspose2d(k4, s2, p1)
                    use_bias=False,
                    transpose_kernel=True,  # torch (in,out,kh,kw) convention
                    kernel_init=normal_001(),
                    dtype=self.dtype,
                    name=f"deconv{i}",
                )(x)
            x = batch_norm(train, self.dtype, f"deconv_bn{i}")(x)
            x = nn.relu(x)

        # Heads (reference :52-53, 108-115): N(0,.001) weights, zero
        # bias.  Deliberately NOT fused into one conv (unlike the
        # hourglass head, BENCH_NOTES_r05.md §5): here XLA already
        # multi-output-fuses the two convs (the deconv output is read
        # once), and a fused 56-ch output forces non-tile-aligned
        # channel slices in the decode consumer — measured +2% op
        # time (runs/trace_r05_resnet vs trace_r02: slice.19 +
        # copy.47 = 0.59 ms/iter of new data formatting).
        head = dict(
            kernel_init=normal_001(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        vec = nn.Conv(self.joint_num * 3, (1, 1), name="final1", **head)(x)
        ht = nn.Conv(self.joint_num, (1, 1), name="final2", **head)(x)
        return jnp.concatenate([vec, ht], axis=-1).astype(jnp.float32)


def get_deconv_net(layers: int, joint_num: int, downsample: int,
                   dtype=jnp.float32, quant_mode="off",
                   remat=False) -> ResNetDeconv:
    """Factory matching reference resnet_deconv.py:8-16."""
    block, layer_sizes = RESNET_SPECS[layers]
    return ResNetDeconv(
        joint_num=joint_num,
        block=block,
        layers=layer_sizes,
        downsample=downsample,
        dtype=dtype,
        quant_mode=quant_mode,
        remat=remat,
    )
