"""Backbones emitting dense 4J-channel AWR maps (NHWC).

- :mod:`awr_tpu.models.resnet`: ResNet-{18,50,101,152} encoder + deconv
  decoder (reference model/resnet_deconv.py).
- :mod:`awr_tpu.models.hourglass`: stacked Hourglass with intermediate
  supervision (reference model/hourglass.py).
- :func:`build_model`: reference-style net-string factory
  ('resnet_18' | 'hourglass_2' | ...; reference train.py:51-57).
"""

from awr_tpu.models.hourglass import PoseNet  # noqa: F401
from awr_tpu.models.resnet import ResNetDeconv, get_deconv_net  # noqa: F401


def build_model(net: str, joint_num: int, downsample: int = 2,
                dtype=None, quant_mode: str = "off",
                remat: bool = False):
    """Net-string factory (reference train.py:51-57, test.py:37-42).

    ``quant_mode`` ('off' | 'calib' | 'int8'): post-training int8
    inference (models/quant.py), both families.  ``remat``:
    rematerialize blocks/stacks in the backward pass (same params and
    outputs, lower peak HBM).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if net.startswith("resnet"):
        layers = int(net.split("_")[1])
        return get_deconv_net(layers, joint_num, downsample, dtype=dtype,
                              quant_mode=quant_mode, remat=remat)
    if net.startswith("hourglass"):
        nstack = int(net.split("_")[1])
        return PoseNet(nstack=nstack, joint_num=joint_num, dtype=dtype,
                       quant_mode=quant_mode, remat=remat)
    raise ValueError(f"unknown net {net!r}")
