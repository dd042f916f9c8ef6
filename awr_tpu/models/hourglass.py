"""Stacked Hourglass backbone with intermediate supervision.

Reference parity: model/hourglass.py — stem keeping downsample 2
(Conv5 s1 + Residual(64,128) + Pool2 + Residual(128,256) +
Residual(256,256), ref :111-118), a recursive depth-4 hourglass per stack
(ref :62-88, depth fixed at :128), per-stack feature head
(Residual + 1x1 Conv+BN+ReLU, ref :131-135), 3J+J 1x1 output heads
concatenated to 4J (ref :137-138,153-157), and between stacks the
re-injection ``x + merge_preds(preds) + merge_features(feature)``
(ref :140-141,162-163).  Residual blocks are pre-activation
(BN->ReLU->conv x3) with a 1x1 skip only on channel change (ref :28-59).

TPU-first: NHWC; the recursion is unrolled statically (each depth is a
distinct submodule) so the whole nstack forward jits to one XLA program;
output is a single stacked (S, B, F, F, 4J) array so all stacks can be
supervised from ONE forward (the reference recomputes the forward per
stack at train.py:116-121 — see Config.supervise_all_stacks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from awr_tpu.models.common import (
    ConvParams,
    TorchConv,
    batch_norm,
    max_pool_torch,
    upsample_nearest_2x,
)


class _HeadBranchParams(nn.Module):
    """Param-owner shim for one output-head branch (vec or ht):
    nests :class:`~awr_tpu.models.common.ConvParams` as ``Conv_0`` so
    the param path ('out_vec0/Conv_0/kernel', ...) is byte-for-byte
    the one :class:`TorchConv` would create — torch weight import,
    Orbax checkpoints, and the int8 QuantConv swap (same 'Conv_0'
    path) are all unaffected by the fused-head compute path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return ConvParams(self.features, self.in_features,
                          name="Conv_0")()


class ConvBlock(nn.Module):
    """Conv (+BN) (+ReLU) (reference hourglass.py:6-25; bias always on)."""

    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = False
    relu: bool = True
    dtype: jnp.dtype = jnp.float32
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(
            self.features, self.kernel, self.stride, dtype=self.dtype,
            quant_mode=self.quant_mode, name="conv",
        )(x)
        if self.bn:
            x = batch_norm(train, self.dtype, "bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Residual(nn.Module):
    """Pre-activation bottleneck residual (reference hourglass.py:28-59)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        qm = self.quant_mode
        out = batch_norm(train, self.dtype, "bn1")(x)
        out = nn.relu(out)
        out = TorchConv(half, 1, dtype=self.dtype, quant_mode=qm,
                        name="conv1")(out)
        out = batch_norm(train, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = TorchConv(half, 3, dtype=self.dtype, quant_mode=qm,
                        name="conv2")(out)
        out = batch_norm(train, self.dtype, "bn3")(out)
        out = nn.relu(out)
        out = TorchConv(self.features, 1, dtype=self.dtype, quant_mode=qm,
                        name="conv3")(out)
        if x.shape[-1] != self.features:
            skip = TorchConv(self.features, 1, dtype=self.dtype,
                             quant_mode=qm, name="skip")(x)
        else:
            skip = x
        return out + skip


class HourglassBlock(nn.Module):
    """Recursive encoder-decoder (reference hourglass.py:62-88).

    The recursion depth ``n`` is a static module attribute, so linen
    unrolls it into distinct submodules at init time.
    """

    n: int
    features: int
    increase: int = 0
    dtype: jnp.dtype = jnp.float32
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, nf = self.features, self.features + self.increase
        qm = self.quant_mode
        up1 = Residual(f, self.dtype, qm, name="up1")(x, train)
        low = max_pool_torch(x, 2, 2, 0)
        low = Residual(nf, self.dtype, qm, name="low1")(low, train)
        if self.n > 1:
            low = HourglassBlock(
                self.n - 1, nf, dtype=self.dtype, quant_mode=qm,
                name="low2",
            )(low, train)
        else:
            low = Residual(nf, self.dtype, qm, name="low2")(low, train)
        low = Residual(f, self.dtype, qm, name="low3")(low, train)
        up2 = upsample_nearest_2x(low)
        return up1 + up2


class PoseNet(nn.Module):
    """(B, H, W, 1) depth -> (S, B, H/2, W/2, 4J) per-stack dense maps."""

    nstack: int = 1
    joint_num: int = 14
    inp_dim: int = 256
    increase: int = 0
    dtype: jnp.dtype = jnp.float32
    # post-training int8 ('off' | 'calib' | 'int8', models/quant.py).
    # The bulk convs (stem, residuals, hourglass) quantize; the 1x1
    # out_vec/out_ht regression heads and the inter-stack merges stay
    # in the compute dtype (tiny FLOPs, precision-sensitive).
    quant_mode: str = "off"
    # Rematerialize each stack's full hourglass in the backward pass
    # (jax.checkpoint via nn.remat): the encoder-decoder pyramid is the
    # activation bulk, so recomputing it per stack cuts peak HBM
    # roughly nstack-fold at one extra forward of FLOPs per stack.
    remat: bool = False

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        qm = self.quant_mode
        hg_cls = HourglassBlock
        if self.remat:
            # `train` (argnum 2 counting self) is a static bool
            hg_cls = nn.remat(HourglassBlock, static_argnums=(2,))
        x = imgs.astype(self.dtype)
        # Stem (reference :111-118): overall downsample 2.
        x = ConvBlock(64, 5, 1, bn=True, relu=True, dtype=self.dtype,
                      quant_mode=qm, name="pre_conv")(x, train)
        x = Residual(128, self.dtype, qm, name="pre_res1")(x, train)
        x = max_pool_torch(x, 2, 2, 0)
        x = Residual(256, self.dtype, qm, name="pre_res2")(x, train)
        x = Residual(self.inp_dim, self.dtype, qm,
                     name="pre_res3")(x, train)

        preds = []
        for i in range(self.nstack):
            hg = hg_cls(
                4, self.inp_dim, self.increase, self.dtype,
                quant_mode=qm, name=f"hg{i}",
            )(x, train)
            feature = Residual(self.inp_dim, self.dtype, qm,
                               name=f"feature_res{i}")(hg, train)
            feature = ConvBlock(
                self.inp_dim, 1, bn=True, relu=True, dtype=self.dtype,
                quant_mode=qm, name=f"feature_conv{i}",
            )(feature, train)
            # Fused output head: ONE 1x1 conv with the vec/ht kernels
            # concatenated on the output-channel axis (57 KB of weight
            # concat) instead of two convs + an output concatenate.
            # Mathematically identical — output channels are
            # independent dot products over the same 256-ch input —
            # but reads the (B,F,F,256) feature map ONCE instead of
            # twice and skips the materialized (B,F,F,4J) concat:
            # ~2 GB/iter on the batch-512 HBM-bound inference trace
            # (BENCH_NOTES_r05.md §5).  Param tree unchanged
            # (ConvParams docstring).  The head branches were always
            # fp even under quant_mode='int8'/'qat' (matching the
            # original per-branch TorchConvs, which never took
            # quant_mode), so the fusion applies in every mode.
            kv, bv = _HeadBranchParams(
                self.joint_num * 3, self.inp_dim,
                name=f"out_vec{i}")()
            kh, bh = _HeadBranchParams(
                self.joint_num, self.inp_dim, name=f"out_ht{i}")()
            k = jnp.concatenate([kv, kh], axis=-1)
            b = jnp.concatenate([bv, bh])
            f_in, k, b = nn.dtypes.promote_dtype(
                feature, k, b, dtype=self.dtype)
            pred = jax.lax.conv_general_dilated(
                f_in, k, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            preds.append(pred.astype(jnp.float32))
            if i < self.nstack - 1:
                # Intermediate re-injection (reference :162-163).
                x = (
                    x
                    + TorchConv(self.inp_dim, 1, dtype=self.dtype,
                                name=f"merge_preds{i}")(pred.astype(self.dtype))
                    + TorchConv(self.inp_dim, 1, dtype=self.dtype,
                                name=f"merge_features{i}")(feature)
                )
        return jnp.stack(preds, axis=0)
