"""PyTorch state-dict -> flax variables importer for parity evals.

Maps the reference checkpoints' key layout (model/resnet_deconv.py,
model/hourglass.py as saved by train.py:165-172) onto this package's
flax module trees, converting layouts:

- Conv2d weight (out, in, kh, kw)          -> kernel (kh, kw, in, out)
- ConvTranspose2d weight (in, out, kh, kw) -> kernel (kh, kw, out, in)
  (our deconvs use ``transpose_kernel=True``, which consumes exactly the
  torch layout modulo the spatial-dims-first permutation)
- BatchNorm2d weight/bias -> scale/bias (params); running_mean/var ->
  mean/var (batch_stats)

Checkpoint loading accepts a ``.pth`` path (via torch, CPU map) or an
already-loaded mapping of arrays.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


class _TreeBuilder:
    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.params: Dict = {}
        self.stats: Dict = {}
        self.used = set()

    def _set(self, tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, sd_key: str, *flax_path: str, bias: bool = False,
             transpose: bool = False):
        w = self.sd[sd_key + ".weight"]
        self.used.add(sd_key + ".weight")
        if transpose:  # ConvTranspose2d (in, out, kh, kw) -> (kh,kw,out,in)
            kernel = w.transpose(2, 3, 1, 0)
        else:  # Conv2d (out, in, kh, kw) -> (kh, kw, in, out)
            kernel = w.transpose(2, 3, 1, 0)
        self._set(self.params, flax_path + ("kernel",), kernel)
        if bias:
            self._set(self.params, flax_path + ("bias",),
                      self.sd[sd_key + ".bias"])
            self.used.add(sd_key + ".bias")

    def bn(self, sd_key: str, *flax_path: str):
        self._set(self.params, flax_path + ("scale",),
                  self.sd[sd_key + ".weight"])
        self._set(self.params, flax_path + ("bias",),
                  self.sd[sd_key + ".bias"])
        self._set(self.stats, flax_path + ("mean",),
                  self.sd[sd_key + ".running_mean"])
        self._set(self.stats, flax_path + ("var",),
                  self.sd[sd_key + ".running_var"])
        for s in (".weight", ".bias", ".running_mean", ".running_var"):
            self.used.add(sd_key + s)

    def variables(self):
        return {"params": self.params, "batch_stats": self.stats}


# --------------------------------------------------------------- resnet
def import_resnet_deconv(sd: Mapping, layers=(2, 2, 2, 2),
                         bottleneck: bool = False,
                         downsample: int = 2):
    """Reference ResnetDeconv state dict -> flax variables."""
    b = _TreeBuilder(sd)
    b.conv("pre.0", "pre_conv")
    b.bn("pre.1", "pre_bn")
    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(layers, start=1):
        for i in range(blocks):
            pfx = f"layer{stage}.{i}"
            dst = f"layer{stage}_{i}"
            for c in range(1, n_convs + 1):
                b.conv(f"{pfx}.conv{c}", dst, f"conv{c}")
                b.bn(f"{pfx}.bn{c}", dst, f"bn{c}")
            if f"{pfx}.downsample.0.weight" in b.sd:
                b.conv(f"{pfx}.downsample.0", dst, "downsample_conv")
                b.bn(f"{pfx}.downsample.1", dst, "downsample_bn")
    deconv_num = 4 - int(np.log2(downsample))
    for i in range(deconv_num):
        b.conv(f"deconv_layers.{3 * i}", f"deconv{i}", transpose=True)
        b.bn(f"deconv_layers.{3 * i + 1}", f"deconv_bn{i}")
    b.conv("final1", "final1", bias=True)
    b.conv("final2", "final2", bias=True)
    return b.variables()


# ------------------------------------------------------------ hourglass
def _conv_block(b: _TreeBuilder, sd_pfx: str, dst: Tuple[str, ...],
                bn: bool):
    """Reference 'Conv' module (conv(+bias), optional bn) -> our
    ConvBlock (TorchConv named 'conv' wrapping an anonymous nn.Conv)."""
    b.conv(f"{sd_pfx}.conv", *dst, "conv", "Conv_0", bias=True)
    if bn:
        b.bn(f"{sd_pfx}.bn", *dst, "bn")


def _residual(b: _TreeBuilder, sd_pfx: str, dst: Tuple[str, ...],
              has_skip: bool):
    for k in (1, 2, 3):
        b.bn(f"{sd_pfx}.bn{k}", *dst, f"bn{k}")
        b.conv(f"{sd_pfx}.conv{k}.conv", *dst, f"conv{k}", "Conv_0",
               bias=True)
    if has_skip:
        b.conv(f"{sd_pfx}.skip_layer.conv", *dst, "skip", "Conv_0",
               bias=True)


def _hourglass(b: _TreeBuilder, sd_pfx: str, dst: Tuple[str, ...],
               n: int):
    _residual(b, f"{sd_pfx}.up1", dst + ("up1",), has_skip=False)
    _residual(b, f"{sd_pfx}.low1", dst + ("low1",), has_skip=False)
    if n > 1:
        _hourglass(b, f"{sd_pfx}.low2", dst + ("low2",), n - 1)
    else:
        _residual(b, f"{sd_pfx}.low2", dst + ("low2",), has_skip=False)
    _residual(b, f"{sd_pfx}.low3", dst + ("low3",), has_skip=False)


def import_posenet(sd: Mapping, nstack: int = 1):
    """Reference PoseNet (stacked hourglass) state dict -> flax variables."""
    b = _TreeBuilder(sd)
    _conv_block(b, "pre.0", ("pre_conv",), bn=True)
    _residual(b, "pre.1", ("pre_res1",), has_skip=True)  # 64 -> 128
    _residual(b, "pre.3", ("pre_res2",), has_skip=True)  # 128 -> 256
    _residual(b, "pre.4", ("pre_res3",), has_skip=False)  # 256 -> 256
    for i in range(nstack):
        _hourglass(b, f"hgs.{i}.0", (f"hg{i}",), 4)
        _residual(b, f"features.{i}.0", (f"feature_res{i}",),
                  has_skip=False)
        _conv_block(b, f"features.{i}.1", (f"feature_conv{i}",), bn=True)
        b.conv(f"outs_1.{i}", f"out_vec{i}", "Conv_0", bias=True)
        b.conv(f"outs_2.{i}", f"out_ht{i}", "Conv_0", bias=True)
        if i < nstack - 1:
            b.conv(f"merge_preds.{i}.conv.conv", f"merge_preds{i}",
                   "Conv_0", bias=True)
            b.conv(f"merge_features.{i}.conv.conv", f"merge_features{i}",
                   "Conv_0", bias=True)
    return b.variables()


# ------------------------------------------------------------- frontend
def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` (train.py:165-172 format: the model state
    dict lives under 'model')."""
    import torch

    pth = torch.load(path, map_location="cpu", weights_only=False)
    sd = pth.get("model", pth)
    return {k: _np(v) for k, v in sd.items()}


def import_reference_weights(net: str, sd_or_path, downsample: int = 2):
    """Net-string dispatch ('resnet_18' | 'hourglass_2' | ...)."""
    sd = (load_torch_checkpoint(sd_or_path)
          if isinstance(sd_or_path, str) else sd_or_path)
    if net.startswith("resnet"):
        from awr_tpu.models.resnet import RESNET_SPECS

        block, layer_sizes = RESNET_SPECS[int(net.split("_")[1])]
        return import_resnet_deconv(
            sd, layer_sizes, bottleneck=(block == "bottleneck"),
            downsample=downsample)
    if net.startswith("hourglass"):
        return import_posenet(sd, nstack=int(net.split("_")[1]))
    raise ValueError(f"unknown net {net!r}")
