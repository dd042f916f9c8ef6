"""Encode dispatch: fused Pallas kernel on TPU, jnp elsewhere.

The encode runs on ground-truth joints inside the train step, so no
gradient path is required (grads are taken w.r.t. params only); the
output is wrapped in stop_gradient for safety.

Multi-device: like the decode, the Pallas encode has no GSPMD
partitioning rule; pass ``mesh`` to shard_map it over the batch axis
(the op is per-sample, so this is exact).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from awr_tpu.ops.functional import joint2offset, on_tpu


def encode_offsets(jt_uvd, img, kernel_size, feature_size,
                   use_pallas: bool = False, mesh=None,
                   interpret: bool = False):
    """(B, J, 3) joints + (B, H, W) depth -> (B, F, F, 4J) GT field."""
    if use_pallas and (on_tpu() or interpret):
        from awr_tpu.ops.pallas_encode import encode_pallas

        if mesh is not None and mesh.devices.size > 1:
            axis = mesh.axis_names[0]
            fn = jax.shard_map(
                lambda j, i: encode_pallas(j, i, kernel_size,
                                           feature_size,
                                           interpret=interpret),
                mesh=mesh, in_specs=(P(axis), P(axis)),
                out_specs=P(axis),
                # pallas_call's out_shape carries no varying-mesh-axes
                # annotation; the kernel is per-sample, so this is safe
                check_vma=False)
            out = fn(jt_uvd, img)
        else:
            out = encode_pallas(jt_uvd, img, kernel_size, feature_size,
                                interpret=interpret)
    else:
        out = joint2offset(jt_uvd, img, kernel_size, feature_size)
    return jax.lax.stop_gradient(out)
