"""Model summary: parameter counts + XLA-cost-model FLOPs.

Equivalent of the reference's ptflops ``__main__`` smoke blocks
(reference resnet_deconv.py:219-232, hourglass.py:167-179).

Usage: ``python -m awr_tpu.models.summary [net] [img_size]``
"""

from __future__ import annotations

import sys


def summarize(net: str = "resnet_18", img_size: int = 128,
              downsample: int = 2, joint_num: int = 14):
    import jax
    import jax.numpy as jnp

    from awr_tpu.models import build_model
    from awr_tpu.utils.profiling import flops_of

    model = build_model(net, joint_num, downsample)
    x = jnp.zeros((1, img_size, img_size, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    n_params = sum(p.size for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    flops = flops_of(
        lambda v, x: model.apply(v, x, train=False), variables, x)
    out_shape = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables, x).shape
    print(f"net: {net}  input: {img_size}x{img_size}x1")
    print(f"params: {n_params / 1e6:.2f} M")
    if flops is not None:
        print(f"fwd flops: {flops / 1e9:.2f} GFLOP/frame "
              f"({flops / 2e9:.2f} GMACs)")
    print(f"output: {out_shape}")
    return n_params, flops


if __name__ == "__main__":
    net = sys.argv[1] if len(sys.argv) > 1 else "resnet_18"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    summarize(net, size)
